"""Params checkpointing via orbax.

The reference only loads pretrained torch blobs (SURVEY.md §5.4); this
adds native save/resume for params pytrees (post-pass FP32 params,
activation ranges) so long calibration runs and converted models persist
without torch.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple


def save_params(
    path: str,
    params: Dict[str, Dict[str, Any]],
    act_ranges: Optional[Dict[str, Tuple[float, float]]] = None,
) -> None:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        payload = {"params": params}
        if act_ranges is not None:
            payload["act_ranges"] = {k: list(v) for k, v in act_ranges.items()}
        ckptr.save(path, payload)


def load_params(path: str):
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        payload = ckptr.restore(path)
    params = payload["params"]
    ranges = payload.get("act_ranges")
    if ranges is not None:
        ranges = {k: (float(v[0]), float(v[1])) for k, v in ranges.items()}
    return params, ranges
