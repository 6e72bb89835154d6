"""Spatial tiling with halo context: shard one large image across devices.

The reference handles big images by padding and running full-image convs
(``utils/eval_model/__main__.py:96-109``). Here the analysis/synthesis
transforms can run tile-wise: each tile window carries interior halo context
at least as large as the transform's one-sided receptive field, and windows
are **clamped inside the image** so a boundary tile's edge coincides with the
real image edge — there the transform's own per-level zero padding matches
the full-image computation exactly (zero-filling an input halo would not:
``conv(0) + bias != 0`` propagates through the levels). Tile outputs are
therefore *exactly* the corresponding crops of the full-image output
(verified in tests).

Tiles form a uniform batch that shards over the mesh's ``dp`` axis (one big
image → many chips); the reassembled latent feeds the unchanged entropy
coding, so bitstreams are identical to the untiled codec.

Receptive-field budget (one side, input pixels) for the google-family g_a
(4x conv k5 s2): sum_l 2 * 2^l = 30 <= halo 32. g_s needs a latent halo of
~2 (4 used). Cheng's deeper residual stacks need halo 64.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["tiled_apply", "tiled_analysis", "tiled_synthesis"]


def tiled_apply(fn, x, tile: int, halo: int, factor: int, out_scale: str,
                mesh=None):
    """Apply a spatial transform tile-wise, exactly.

    Args:
        fn: jittable (B, h, w, C) -> (B, h', w', C') transform with uniform
            spatial scale 1/``factor`` (``out_scale="down"``) or ``factor``
            (``out_scale="up"``).
        x: (1, H, W, C) input. For "down", H, W, tile and halo must be
            multiples of ``factor`` (the stride lattice).
        tile: core tile size in input pixels.
        halo: one-sided context in input pixels (>= the transform's
            one-sided receptive field).
        mesh: optional Mesh; the tile batch shards over its ``dp`` axis.
    """
    assert x.shape[0] == 1, "tiling operates on a single image"
    _, H, W, _ = x.shape
    down = out_scale == "down"
    if down:
        if H % factor or W % factor or tile % factor or halo % factor:
            raise ValueError("H, W, tile and halo must be stride-aligned")
        sf = factor
        out_div = factor
    else:
        sf = 1  # latent-space lattice has stride 1
        out_div = 1

    # per-axis windows; an axis shorter than tile + 2*halo becomes one tile
    win_y = min(tile + 2 * halo, H)
    win_x = min(tile + 2 * halo, W)
    ny = 1 if win_y == H else -(-H // tile)
    nx = 1 if win_x == W else -(-W // tile)

    starts_y = [min(max(i * tile - halo, 0), H - win_y) for i in range(ny)]
    starts_x = [min(max(j * tile - halo, 0), W - win_x) for j in range(nx)]
    # clamped starts stay on the stride lattice because tile/halo/H/W are
    # all multiples of `factor` in the "down" case
    assert all(s % sf == 0 for s in starts_y + starts_x)

    xj = jnp.asarray(x)
    tiles = [
        jax.lax.dynamic_slice(
            xj, (0, sy, sx, 0), (1, win_y, win_x, x.shape[3])
        )[0]
        for sy in starts_y
        for sx in starts_x
    ]
    batch = jnp.stack(tiles)

    if mesh is not None:
        from .mesh import batch_sharding

        batch = jax.device_put(batch, batch_sharding(mesh))

    out = fn(batch)

    if down:
        o = lambda v: v // factor
        Ho, Wo = H // factor, W // factor
    else:
        o = lambda v: v * factor
        Ho, Wo = H * factor, W * factor

    full = jnp.zeros((1, Ho, Wo, out.shape[-1]), out.dtype)
    k = 0
    for i in range(ny):
        core_y0 = i * tile if ny > 1 else 0
        core_y1 = min(core_y0 + tile, H) if ny > 1 else H
        off_y = o(core_y0 - starts_y[i])
        len_y = o(core_y1 - core_y0)
        for j in range(nx):
            core_x0 = j * tile if nx > 1 else 0
            core_x1 = min(core_x0 + tile, W) if nx > 1 else W
            off_x = o(core_x0 - starts_x[j])
            len_x = o(core_x1 - core_x0)
            core = out[k][off_y : off_y + len_y, off_x : off_x + len_x]
            full = jax.lax.dynamic_update_slice(
                full, core[None], (0, o(core_y0), o(core_x0), 0)
            )
            k += 1
    return full


def tiled_analysis(model, x, tile: int = 512, halo: int = 32, mesh=None):
    """Run the model's g_a tile-wise; exactly equals the untiled latents."""
    net_cls = type(model.net)

    def ga(batch):
        return model.net.apply(
            {"params": model.params}, batch, method=net_cls.analysis
        )

    return tiled_apply(
        ga, x, tile, halo, model.downsampling_factor_ga(), "down", mesh=mesh
    )


def tiled_synthesis(model, y_hat, tile: int = 32, halo: int = 4, mesh=None):
    """Run the model's g_s tile-wise over the latent grid; exactly equals the
    untiled reconstruction."""
    net_cls = type(model.net)

    def gs(batch):
        return model.net.apply(
            {"params": model.params}, batch, method=net_cls.synthesis
        )

    return tiled_apply(
        gs, y_hat, tile, halo, model.downsampling_factor_ga(), "up", mesh=mesh
    )
