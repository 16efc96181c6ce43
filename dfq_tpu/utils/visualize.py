"""Per-channel weight-range diagnostics.

Behavioral contract: reference ``visualize_per_layer``
(``/root/reference/utils/__init__.py:1-13``) — the DFQ paper's
per-output-channel weight boxplots, used before/after equalization to
show range balancing (hooked at ``dfq.py:88-89,102-103``).
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def visualize_per_layer(
    weight: np.ndarray,
    title: str = "",
    save_path: Optional[str] = None,
    max_channels: int = 128,
):
    """Boxplot of per-output-channel weight distributions. Returns the
    matplotlib figure (saved to ``save_path`` if given)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    w = np.asarray(weight)
    flat = w.reshape(w.shape[0], -1)
    n = min(flat.shape[0], max_channels)
    fig, ax = plt.subplots(figsize=(max(8, n // 8), 4))
    ax.boxplot([flat[i] for i in range(n)], showfliers=False)
    ax.set_xlabel("output channel")
    ax.set_ylabel("weight value")
    ax.set_title(title)
    if save_path:
        fig.savefig(save_path, dpi=100, bbox_inches="tight")
        plt.close(fig)
    return fig
