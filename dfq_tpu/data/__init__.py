from dfq_tpu.data.imagenet import imagenet_batches, load_image  # noqa: F401
