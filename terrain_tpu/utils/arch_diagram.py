"""Architecture diagrams: the PNG the reference got from nolearn.

The reference wrote best-effort network diagrams at train start
(`draw_to_file(get_all_layers(...), "<out>/gen_dcgan.png")`, reference
pix2pix.py:226-233, guarded by a bare try/except because nolearn was
optional).  This renders the equivalent from a `Network`'s param tree: one
box per parameterized block (conv/deconv/dense/BN groups share a box),
labeled with the op kind, weight shape and parameter count, connected
top-to-bottom in parameter order, with the factory config in the title.

Pure-host matplotlib; no device work.
"""

import jax
import numpy as np


def _blocks(params):
    """Group param leaves by their parent path -> ordered block list.

    Returns [(label, {leafname: shape}, n_params), ...] in tree order —
    the same deterministic insertion order `describe` and the checkpoint
    importer rely on (models/core.py module docstring).
    """
    flat = jax.tree_util.tree_leaves_with_path(params)
    order = []
    groups = {}
    for path, leaf in flat:
        parent = jax.tree_util.keystr(path[:-1]) or "(root)"
        name = jax.tree_util.keystr(path[-1:]).strip("[]'\"")
        if parent not in groups:
            groups[parent] = {}
            order.append(parent)
        groups[parent][name] = tuple(leaf.shape)
    out = []
    for parent in order:
        leaves = groups[parent]
        n = sum(int(np.prod(s)) for s in leaves.values())
        out.append((parent, leaves, n))
    return out


def _kind(leaves):
    """Human label for a block from its leaf shapes."""
    if "w" in leaves:
        s = leaves["w"]
        if len(s) == 4:
            return f"conv {s[0]}x{s[1]} {s[2]}→{s[3]}"
        if len(s) == 2:
            return f"dense {s[0]}→{s[1]}"
    if set(leaves) >= {"gamma", "beta"}:
        return f"batchnorm ({leaves['gamma'][0]})"
    return ", ".join(sorted(leaves))


def draw_network(net, params, path):
    """Render `net`'s block diagram to `path` (PNG).  Returns the block
    count so callers/tests can sanity-check coverage."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.patches import FancyArrow, Rectangle

    blocks = _blocks(params)
    n = len(blocks)
    total = sum(b[2] for b in blocks)
    fig_h = max(2.0, 0.42 * n + 1.2)
    fig, ax = plt.subplots(figsize=(7.2, fig_h))
    ax.set_xlim(0, 1)
    ax.set_ylim(0, n)
    ax.axis("off")
    cfg = "  ".join(f"{k}={v!r}" for k, v in sorted(net.config.items()))
    ax.set_title(f"{net.name} — {total:,} params\n{cfg}",
                 fontsize=7, loc="left", family="monospace")
    # color by op family, like nolearn's per-layer-type coloring
    colors = {"conv": "#cfe8ff", "dense": "#ffe3c2", "batchnorm": "#e4f7d7"}
    for i, (parent, leaves, cnt) in enumerate(blocks):
        y = n - 1 - i
        kind = _kind(leaves)
        fam = kind.split()[0]
        ax.add_patch(Rectangle((0.08, y + 0.08), 0.84, 0.84,
                               facecolor=colors.get(fam, "#eeeeee"),
                               edgecolor="#333333", linewidth=0.6))
        ax.text(0.11, y + 0.5, f"{parent}", fontsize=6.5,
                va="center", family="monospace")
        ax.text(0.89, y + 0.5, f"{kind}   {cnt:,}", fontsize=6.5,
                va="center", ha="right", family="monospace")
        if i < n - 1:
            ax.add_patch(FancyArrow(0.5, y + 0.06, 0, -0.04, width=0.0005,
                                    head_width=0.015, head_length=0.02,
                                    color="#333333"))
    fig.savefig(path, dpi=150, bbox_inches="tight")
    plt.close(fig)
    return n
