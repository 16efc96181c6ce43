"""Distillation (ZeroQ synthesis) throughput on the real chip.

This framework's "training step" is the jitted distilled-data synthesis
(``calib/distill.py``): one Adam update on a batch of synthetic images
against the BN-statistics loss, the whole optimization a single
``lax.while_loop`` on device. The reference runs the same loss as a
hooked torch Python loop (``ZeroQ/distill_data.py:172-216``, 500
iterations per batch). Measured here: per-iteration step time at
batch 64 / 224x224 on MobileNetV2, and the derived images-synthesized/s
at the reference's 500-iteration budget.

Timing: the while_loop runs exactly ``max_iters`` iterations when
``early_break_factor=0`` (threshold 0 < any loss), so the per-iteration
time is the slope between a short and a long synthesis — same
methodology as bench.py, interleaved rounds, median slope.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")

_ARGS = argparse.ArgumentParser()
_ARGS.add_argument("--mesh", type=int, default=None,
                   help="run the SHARDED distill step over an N-device "
                        "mesh instead of the single-chip bench (use "
                        "--platform cpu for the virtual-mesh harness)")
_ARGS.add_argument("--platform", type=str, default=None)
_ARGS.add_argument("--batch", type=int, default=None)
_ARGS.add_argument("--size", type=int, default=None)
_ARGS.add_argument("--compute-dtype", type=str, default="f32",
                   choices=["f32", "bf16"],
                   help="network math dtype for the synthesis step "
                        "(bf16 = MXU-native; stats/loss/Adam stay f32)")
args = _ARGS.parse_args()

if args.platform == "cpu" and args.mesh:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.mesh}"
        ).strip()

import jax

if args.platform:
    jax.config.update("jax_platforms", args.platform)

if args.mesh and len(jax.devices()) < args.mesh:
    raise SystemExit(
        f"--mesh {args.mesh} but only {len(jax.devices())} devices exist "
        "(a pre-set xla_force_host_platform_device_count in XLA_FLAGS "
        "wins over --mesh; unset it or make them agree)"
    )

from dfq_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax.numpy as jnp
import numpy as np

BATCH = args.batch or 64
SIZE = args.size or 224


def bench_mesh(n: int):
    """Sharded-distillation scaling harness: per-iteration time of the
    data-parallel ZeroQ step (psum'd BN-statistics loss) at mesh sizes
    1 and n — the training-step analog of ``bench.py --mesh``. On a
    virtual CPU mesh the n devices share one socket, so the ratio
    validates the instrument, not real ICI scaling."""
    from dfq_tpu.calib.distill import DistillConfig, init_random_batch
    from dfq_tpu.models import init_params, mobilenet_v2
    from dfq_tpu.parallel import data_mesh, make_sharded_distill_step
    from dfq_tpu.passes import fold_batchnorm

    graph = mobilenet_v2()
    params = init_params(graph, seed=0, bn_stats="random")
    gf, pf = fold_batchnorm(graph, params)
    results = {}
    for nd in sorted({1, n}):
        mesh = data_mesh(nd)
        cfg = DistillConfig(
            batch_size=BATCH * nd, image_size=(SIZE, SIZE), max_iters=1
        )
        step, init = make_sharded_distill_step(gf, pf, cfg, mesh)
        x0 = jnp.asarray(init_random_batch(np.random.default_rng(0), cfg))
        with mesh:
            x, opt_state = init(x0)
            t0 = time.time()
            x, opt_state, loss = step(x, opt_state)
            jax.device_get(loss)
            print(f"# mesh{nd} compile+first: {time.time() - t0:.1f}s "
                  f"(loss {float(loss):.1f})", file=sys.stderr)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                x, opt_state, loss = step(x, opt_state)
                jax.device_get(loss)
                best = min(best, time.perf_counter() - t0)
        results[nd] = BATCH * nd / best
        print(f"# distill mesh n={nd}: {best * 1e3:.1f} ms/step, "
              f"{results[nd]:.1f} img-iters/s", file=sys.stderr)
    print(json.dumps({
        "metric": "distill_img_iters_per_sec_mesh_scaling",
        "value": round(results[n], 1),
        "unit": "img-iters/s",
        "vs_baseline": round(results[n] / results[1], 3),
        "mesh": n, "batch_per_device": BATCH, "image_size": SIZE,
    }))


def main():
    from dfq_tpu.calib.distill import DistillConfig, distill_batch_fn
    from dfq_tpu.models import init_params, mobilenet_v2
    from dfq_tpu.passes import fold_batchnorm

    graph = mobilenet_v2()
    params = init_params(graph, seed=0, bn_stats="random")
    gf, pf = fold_batchnorm(graph, params)

    # seed batch generated on-device (38MB upload costs minutes through
    # the tunnel); same uniform integer-grid distribution as
    # init_random_batch
    cfg0 = DistillConfig(batch_size=BATCH, image_size=(SIZE, SIZE))
    x0 = jax.jit(
        lambda: (
            jax.random.randint(
                jax.random.PRNGKey(0), (BATCH, SIZE, SIZE, 3), 0, 255
            ).astype(jnp.float32)
            - 127.0
        )
        / 128.0
        * cfg0.max_value
    )()

    runs = {}
    for iters in (5, 30):
        cfg = DistillConfig(
            batch_size=BATCH, image_size=(SIZE, SIZE),
            max_iters=iters, early_break_factor=0.0,
            compute_dtype=args.compute_dtype,
        )
        run = distill_batch_fn(gf, pf, cfg)
        t0 = time.time()
        _, it, loss = run(x0)
        it, loss = int(it), float(loss)
        print(
            f"# compile+first distill n={iters}: {time.time() - t0:.1f}s "
            f"(ran {it} iters, loss {loss:.1f})",
            file=sys.stderr,
        )
        assert it == iters and np.isfinite(loss)
        runs[iters] = run

    slopes = []
    for _ in range(3):
        ts = {}
        for iters, run in runs.items():
            t0 = time.perf_counter()
            jax.device_get(run(x0)[2])
            ts[iters] = time.perf_counter() - t0
        slopes.append((ts[30] - ts[5]) / 25)
    slopes.sort()
    # lower-median, matching bench.step_time: tunnel hiccups only ever
    # ADD time, so the lower of two middle samples is less contaminated
    t_step = slopes[(len(slopes) - 1) // 2]
    print(
        f"# compute_dtype={args.compute_dtype}", file=sys.stderr)
    print(
        "# distill step slopes (ms): "
        + ", ".join(f"{s * 1e3:.1f}" for s in slopes),
        file=sys.stderr,
    )
    ips_500 = BATCH / (500 * t_step)
    print(
        f"# distill: {t_step * 1e3:.1f} ms/step (batch {BATCH}, {SIZE}^2), "
        f"{BATCH / t_step:.0f} img-iters/s, "
        f"{ips_500:.1f} img synthesized/s at the reference's 500-iter budget",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "distill_step_ms_mobilenetv2_b64_224",
        "value": round(t_step * 1e3, 2),
        "unit": "ms/step",
        "images_synthesized_per_s_at_500_iters": round(ips_500, 2),
    }))


if __name__ == "__main__":
    if args.mesh:
        bench_mesh(args.mesh)
    else:
        main()
