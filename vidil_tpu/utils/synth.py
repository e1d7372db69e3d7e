"""On-device synthetic parameter fill for benches and profiling tools.

The host has one slow CPU core and the device tunnel uploads at ~22 MB/s,
so full-size host RNG init + transfer costs minutes; eager device RNG
programs compile unpredictably on the remote-compile backend. A
deterministic sin fill compiles and runs in seconds, gives
well-conditioned weights (LN scales = 1, biases = 0, everything else
small-amplitude), and never touches the host or the transfer link.

Call inside jit — `synth_tree` is a pure function of the shape tree, so
several trees can be synthesized in ONE program:

    cap, fil = jax.jit(lambda: (synth_tree(cap_shapes, salt=1.0),
                                synth_tree(fil_shapes, salt=2.0)))()
"""

from __future__ import annotations

import numpy as np


def synth_tree(shapes, salt: float = 0.0, amplitude: float = 0.05):
    """Fill a `jax.eval_shape` pytree with deterministic sin values.

    Leaves named `scale` become ones, `bias` zeros (well-conditioned
    LayerNorms); non-float leaves (optimizer step counters, queue
    pointers) become zeros; everything else gets
    sin(arange(n) * 12.9898 + salt * 78.233 + leaf_index) * amplitude.
    `salt` decorrelates separately-synthesized trees (e.g. captioner vs
    filter); `leaf_index` decorrelates leaves within one tree.
    """
    import jax
    import jax.numpy as jnp

    idx = [0]

    def fill(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        i = idx[0]
        idx[0] += 1
        if not jnp.issubdtype(leaf.dtype, jnp.floating):
            return jnp.zeros(leaf.shape, leaf.dtype)
        if name == "scale":
            return jnp.ones(leaf.shape, leaf.dtype)
        if name == "bias":
            return jnp.zeros(leaf.shape, leaf.dtype)
        n = int(np.prod(leaf.shape)) if leaf.shape else 1
        # two separate f32 adds, matching the original inline fills
        # bitwise (bench weights must stay bit-stable across rounds: the
        # CapFilt bench's fused-filter fallback behavior is caption-
        # dependent, so even 1-ulp weight drift could move its numbers)
        x = jnp.arange(n, dtype=jnp.float32) * 12.9898 + salt * 78.233
        x = jnp.sin(x + i) * amplitude
        return x.reshape(leaf.shape).astype(leaf.dtype)

    return jax.tree_util.tree_map_with_path(fill, shapes)
