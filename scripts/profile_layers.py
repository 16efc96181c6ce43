"""Per-layer device-time attribution from a real xprof trace.

The engines label every node's ops with ``jax.named_scope(node.name)``,
so a device trace attributes each HLO (including fusions) to a graph
node. This script traces the fused int8 MNV2 forward on the real chip,
parses the xplane protobuf directly (``xprof.protobuf.xplane_pb2`` is in
the image; no TensorBoard needed), and prints:

  - per-node device time (ms per step),
  - per-kind aggregation (dw / pw / conv / other),
  - per-dw-layer effective GB/s (2*N*H*W*C int8 bytes / time) — the
    calibration data for the honest per-layer roofline
    (``utils/profiling.roofline_report``).

Usage: python scripts/profile_layers.py [--steps 8] [--dw-dense N]
"""

import argparse
import collections
import glob
import json
import os
import re
import sys
import tempfile
import time

sys.path.insert(0, ".")

import jax

if "--no-cache" not in sys.argv:
    # NOTE: the persistent cache key ignores metadata-only changes, so a
    # trace after adding/altering named scopes needs --no-cache once to
    # get an executable whose op_name metadata matches the source
    from dfq_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

import jax.numpy as jnp
import numpy as np


def parse_xplane(logdir):
    """Return {plane_name: [(event_name, scope_stat_or_None, dur_ps, occurrences)]}."""
    try:
        from xprof.protobuf import xplane_pb2
    except ImportError:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    assert paths, f"no xplane under {logdir}"
    out = {}
    for path in paths:
        xspace = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xspace.ParseFromString(f.read())
        for plane in xspace.planes:
            evs = []
            meta = plane.event_metadata
            stat_meta = plane.stat_metadata
            for line in plane.lines:
                for ev in line.events:
                    md = meta[ev.metadata_id]
                    scope = None
                    for st in list(ev.stats) + list(md.stats):
                        sname = stat_meta[st.metadata_id].name
                        if sname in ("tf_op", "hlo_op", "name", "long_name"):
                            val = st.str_value or stat_meta.get(
                                st.ref_value, xplane_pb2.XStatMetadata()
                            ).name
                            if val:
                                scope = (sname, val)
                                break
                    evs.append((md.name, scope, ev.duration_ps, line.name))
            out.setdefault(plane.name, []).extend(evs)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--model", type=str, default="mnv2",
                    choices=["mnv2", "r18", "deeplab", "ssd", "mb1ssd",
                             "mb1ssd_lite", "vgg16ssd", "deeplab_xception",
                             "deeplab_drn", "deeplab_r101"])
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--dw-dense", type=int, default=0)
    ap.add_argument("--barriers", action="store_true",
                    help="optimization_barrier around dw convs so they "
                         "cannot fuse into neighbor fusions: the trace "
                         "then has TRUE dw rows (profiling-only mode; "
                         "changes scheduling, so total ms is not the "
                         "serving number)")
    ap.add_argument("--dump-raw", action="store_true")
    ap.add_argument("--no-cache", action="store_true")
    args = ap.parse_args()

    from dfq_tpu.engine import lower_int8
    from dfq_tpu.engine.int8_fused import execute_int8_fused
    from dfq_tpu.models import (
        deeplab_mobilenet_v2,
        init_params,
        mobilenet_v2,
        mobilenet_v2_ssd_lite,
    )
    from dfq_tpu.pipeline import QuantConfig, prepare
    from dfq_tpu.utils.profiling import layer_costs

    size = 224
    det = False
    calib_route = False
    if args.model in ("mb1ssd", "mb1ssd_lite", "vgg16ssd"):
        # BN-less conv stacks: BN-derived ranges are structurally
        # impossible (see scripts/bench_ssd_variants.py) — calibrated
        # route below
        import dfq_tpu.models as M

        builder = {"mb1ssd": "mobilenet_v1_ssd",
                   "mb1ssd_lite": "mobilenet_v1_ssd_lite",
                   "vgg16ssd": "vgg16_ssd"}[args.model]
        graph, size, det = getattr(M, builder)(num_classes=21), 300, True
        calib_route = True
    elif args.model in ("deeplab_xception", "deeplab_drn", "deeplab_r101"):
        import dfq_tpu.models as M

        builder = {"deeplab_xception": "deeplab_xception",
                   "deeplab_drn": "deeplab_drn",
                   "deeplab_r101": "deeplab_resnet101"}[args.model]
        graph, size = getattr(M, builder)(input_size=513), 513
    elif args.model == "r18":
        from dfq_tpu.models import resnet18

        graph = resnet18()
    elif args.model == "deeplab":
        graph, size = deeplab_mobilenet_v2(input_size=513), 513
    elif args.model == "ssd":
        graph, size, det = mobilenet_v2_ssd_lite(num_classes=21), 300, True
    else:
        graph = mobilenet_v2()
    params = init_params(graph, seed=0, bn_stats="random")
    if calib_route:
        from dfq_tpu.calib import DistillConfig, calibrate_ranges
        from dfq_tpu.calib.distill import init_random_batch

        prep = prepare(graph, params, QuantConfig(
            quantize=True, relu=True, bits_bias=16,
            is_detection=True, distill_range=True))
        dc = DistillConfig(batch_size=4, image_size=(size, size), num_batch=1)
        prep.act_ranges = calibrate_ranges(
            prep.graph, prep.params,
            [init_random_batch(np.random.default_rng(0), dc)])
    else:
        cfg = QuantConfig(quantize=True, relu=True, equalize=True,
                          bits_bias=16, is_detection=det)
        prep = prepare(graph, params, cfg)
    model = lower_int8(prep)
    batch = args.batch
    x = jax.jit(
        lambda: jax.random.normal(
            jax.random.PRNGKey(0), (batch, size, size, 3), jnp.float32
        )
    )()

    def _fwd(v):
        out = execute_int8_fused(
            model, prep.params, v, dw_dense_max_ch=args.dw_dense,
            profile_barriers=args.barriers,
        )
        if isinstance(out, tuple):
            # multi-head graphs: consume every output in the trace
            return sum(jnp.sum(o.astype(jnp.float32)) for o in out)
        return out

    fwd = jax.jit(_fwd)
    t0 = time.time()
    compiled = fwd.lower(x).compile()
    print(f"# compile: {time.time() - t0:.1f}s", file=sys.stderr)
    jax.device_get(compiled(x))  # warm + tunnel

    logdir = tempfile.mkdtemp(prefix="dfq_prof_")
    with jax.profiler.trace(logdir):
        for _ in range(args.steps):
            out = compiled(x)
        jax.device_get(out)
    print(f"# trace captured to {logdir}", file=sys.stderr)

    planes = parse_xplane(logdir)
    for pname, evs in planes.items():
        print(f"# plane {pname!r}: {len(evs)} events", file=sys.stderr)

    # device plane: the one with TPU in the name and XLA op events
    dev = None
    for pname in planes:
        if "TPU" in pname or "tpu" in pname.lower():
            dev = pname
            break
    if dev is None:
        print(json.dumps({"error": "no TPU plane", "planes": list(planes)}))
        return
    evs = planes[dev]

    if args.dump_raw:
        seen = set()
        for name, scope, dur, line in evs[:4000]:
            key = (name, scope, line)
            if key in seen:
                continue
            seen.add(key)
            print(f"RAW {line} | {name} | {scope} | {dur}", file=sys.stderr)

    # per-node aggregation: the named scope appears in the event name or
    # the tf_op/long_name stat as ".../<node-name>/..."
    node_names = sorted((n.name for n in graph), key=len, reverse=True)
    pat = re.compile(
        "(" + "|".join(re.escape(n) for n in node_names) + ")"
    )
    # Attribution caveat: XLA fuses neighboring ops (notably each dw conv
    # into an adjacent pw fusion); a fused op's whole duration is credited
    # to the FIRST node scope appearing in its name, so dw time rides on
    # its neighbor's row. Only the sync op line is counted — "Async XLA
    # Ops" carries overlapped DMAs (weight prefetch copy-starts) that are
    # not critical-path device time.
    per_node = collections.Counter()
    unattributed = collections.Counter()
    total = 0
    for name, scope, dur, line in evs:
        if line != "XLA Ops":
            continue
        text = name
        if scope is not None:
            text = f"{name} {scope[1]}"
        m = pat.search(text)
        total += dur
        if m:
            per_node[m.group(1)] += dur
        else:
            unattributed[name.split(".")[0]] += dur

    steps = args.steps
    rows = []
    costs = {c["name"]: c for c in layer_costs(graph, batch, size)}
    for node, dur in per_node.most_common():
        ms = dur / 1e12 * 1e3 / steps
        row = {"node": node, "ms": round(ms, 4)}
        c = costs.get(node)
        if c:
            row["kind"] = c["kind"]
            row["eff_gbps"] = round(c["bytes"] / (ms / 1e3) / 1e9, 1)
            row["eff_tops"] = round(c["flops"] / (ms / 1e3) / 1e12, 1)
        rows.append(row)

    kinds = collections.Counter()
    for r in rows:
        kinds[r.get("kind", "other")] += r["ms"]
    print(json.dumps({
        "model": args.model,
        "dw_dense_max_ch": args.dw_dense,
        "barriers": args.barriers,
        "steps": steps,
        "total_device_ms_per_step": round(total / 1e12 * 1e3 / steps, 3),
        "attributed_ms_per_step": round(
            sum(r["ms"] for r in rows), 3
        ),
        "unattributed_top": dict(
            (k, round(v / 1e12 * 1e3 / steps, 3))
            for k, v in unattributed.most_common(8)
        ),
        "by_kind_ms": {k: round(v, 3) for k, v in kinds.items()},
        "layers": rows,
    }, indent=1))


if __name__ == "__main__":
    main()
