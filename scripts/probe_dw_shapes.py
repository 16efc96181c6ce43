"""Per-shape depthwise-conv measurement + the dw-on-MXU experiment.

Round-2's dw calibration ("XLA int8 dw = ~110 GB/s effective, VPU
tap-bound") came from ``bench_kernels.py``, whose timed loop CAST the
input f32->int8 inside the loop — the measured traffic was ~5 bytes/elem,
not the 2 counted, so the real dw rate was understated ~2.5x. This probe
times pure int8-domain chains (in int8, out int8, requant epilogue, no
casts) for EVERY distinct dw shape in MobileNetV2, and for each shape
also times the dense-diagonal rewrite:

    dw3x3(x, w)  ==  conv3x3_dense(x, W)  with  W[di,dj] = diag(w[:,di,dj])

which is bit-exact (same int8 taps, zeros elsewhere) but runs on the MXU
at 9*C x the MACs. Crossover estimate: MXU wins when
9*C^2/rate_mxu < 2*C/rate_vpu, i.e. C below a few hundred — exactly the
early high-resolution layers that dominate MNV2's time.

Output: one line per (C, H, stride): t_us and effective GB/s (2*N*H*W*C
int8 bytes) for grouped-XLA vs dense-diagonal, plus the winner.
Loop counts are sized for sub-ms ops (n=16/96): the first run with
n=4/24 produced noise-limited (even negative) slopes on the <100us
shapes.
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax

from dfq_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax.numpy as jnp
import numpy as np
from jax import lax

N_BATCH = 128


def slope_time(make_loop, n_small=16, n_big=96, repeats=3, tag="", prime=None):
    """Per-step time via the slope between two chained loops (pure
    device-side data dependence, scalar fetch only). ``prime`` is a
    (fn, args) pair AOT-compiled FIRST: compiling an int8 conv initially
    inside a fori_loop context sends XLA's autotuner off for tens of
    minutes (round-1's 341s, reproduced here at >25min); compiling the
    bare conv first primes the autotune cache and the loop compiles in
    seconds (same effect bench.py relies on)."""
    if prime is not None:
        fn, fargs = prime
        t0 = time.time()
        jax.jit(fn).lower(*fargs).compile()
        print(f"#   {tag} prime: {time.time() - t0:.1f}s", file=sys.stderr)
    times = {}
    for n in (n_small, n_big):
        run = make_loop(n)
        t0 = time.time()
        compiled = run[0].lower(*run[1]).compile()
        dt = time.time() - t0
        jax.device_get(compiled(*run[1]))  # warm
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            jax.device_get(compiled(*run[1]))
            best = min(best, time.perf_counter() - t0)
        times[n] = best
        print(f"#   {tag} n={n}: compile {dt:.1f}s run {best:.3f}s", file=sys.stderr)
    return (times[n_big] - times[n_small]) / (n_big - n_small)


def _requant(acc, alpha):
    q = jnp.round(acc.astype(jnp.float32) * alpha)
    return (jnp.clip(q, -128.0, 127.0)).astype(jnp.int8)


def make_case(C, H, stride, dense):
    """Build one dw case: int8 input, the conv+requant fn, and a loop
    factory. Each iteration folds a FULL reduction of the output into
    the next input's XOR, so every output element is live (a lone
    corner-element consume would let XLA dead-code the requant epilogue
    and most of the conv). Caveat: XLA may fuse the reduction and elide
    the HBM store of ``out``, so the effective GB/s is an optimistic
    read+compute bound, not proof of write traffic."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-128, 128, (N_BATCH, H, H, C)), jnp.int8)
    if dense:
        wd = np.zeros((3, 3, C, C), np.int8)
        taps = rng.integers(-4, 5, (3, 3, C))
        for di in range(3):
            for dj in range(3):
                wd[di, dj, np.arange(C), np.arange(C)] = taps[di, dj]
        w = jnp.asarray(wd)
        groups = 1
    else:
        w = jnp.asarray(
            rng.integers(-4, 5, (3, 3, 1, C)), jnp.int8
        )
        groups = C
    alpha = 1.0 / 36.0

    def conv(v):
        acc = lax.conv_general_dilated(
            v, w, (stride, stride), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups,
            preferred_element_type=jnp.int32,
        )
        return _requant(acc, alpha)

    def loop(n):
        @jax.jit
        def run(x):
            def body(i, carry):
                xq, s = carry
                out = conv(jnp.bitwise_xor(xq, s))
                consumed = jnp.sum(out.astype(jnp.int32))
                return xq, (consumed % 113).astype(jnp.int8)

            _, s = lax.fori_loop(0, n, body, (x, jnp.int8(0)))
            return s

        return run, (x,)

    return conv, x, loop


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", type=str, nargs="*", default=None,
                    help="subset as C,H,s triples, e.g. 144,56,1")
    ap.add_argument("--n-small", type=int, default=0)
    ap.add_argument("--n-big", type=int, default=0,
                    help="0 = auto-size per shape so the big loop "
                         "carries >= ~150ms of signal: at n=96 a "
                         "~100us op contributes ~10ms of loop signal, "
                         "below the tunnel's run-to-run noise (the "
                         "round-3 C=144 56^2 s1 '10.5us' row implied "
                         "11 TB/s, 13x HBM peak)")
    args = ap.parse_args()

    # distinct MNV2 dw shapes: (C, input H at 224^2, stride)
    shapes = [
        (32, 112, 1), (96, 112, 2), (144, 56, 1), (144, 56, 2),
        (192, 28, 1), (192, 28, 2), (384, 14, 1), (576, 14, 1),
        (576, 14, 2), (960, 7, 1),
    ]
    if args.shapes:
        want = {tuple(int(v) for v in s.split(",")) for s in args.shapes}
        shapes = [s for s in shapes if s in want]
    results = []
    for C, H, s in shapes:
        Ho = H // s
        bytes_eff = N_BATCH * (H * H + Ho * Ho) * C  # int8 in + out
        row = {"C": C, "H": H, "stride": s}
        for dense in (False, True):
            tag = f"C{C} H{H} s{s} {'dense' if dense else 'grouped'}"
            conv, xin, loop = make_case(C, H, s, dense)
            if args.n_big:
                n_small, n_big = args.n_small or args.n_big // 6, args.n_big
            else:
                # auto-size: big loop >= ~150ms of signal at an assumed
                # HBM-peak rate (dense variants are slower, fine)
                t_est = bytes_eff / 819e9
                n_big = max(96, int(0.15 / t_est) // 96 * 96 + 96)
                n_small = n_big // 6
            t = slope_time(
                loop, n_small=n_small, n_big=n_big,
                tag=tag, prime=(conv, (xin,)),
            )
            key = "dense" if dense else "grouped"
            row[f"t_us_{key}"] = round(t * 1e6, 1)
            row[f"gbps_{key}"] = round(bytes_eff / t / 1e9, 1)
        row["winner"] = (
            "dense" if row["t_us_dense"] < row["t_us_grouped"] else "grouped"
        )
        row["speedup_dense"] = round(row["t_us_grouped"] / row["t_us_dense"], 2)
        print(json.dumps(row), flush=True)
        results.append(row)

    # whole-model impact at batch 128: sum of dw time, best-of vs grouped
    t_grouped = sum(r["t_us_grouped"] for r in results)
    t_best = sum(min(r["t_us_grouped"], r["t_us_dense"]) for r in results)
    print(
        f"# sum over unique dw shapes: grouped {t_grouped:.0f}us, "
        f"best-of {t_best:.0f}us ({t_grouped / t_best:.2f}x)",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
