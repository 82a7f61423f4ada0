"""Cumulative render-pipeline prefixes for honest on-chip stage timing.

Each prefix runs the EXACT production pipeline up to a stage and ends in a
tiny reduction (keeps every output live, costs nothing), so the delta
between consecutive prefixes is that stage's true incremental cost under
full XLA fusion. Shared by tools/stage_split.py (interactive splits) and
bench.py (the end-of-round per-stage measured-vs-SoL table).

Timing caveat (tools/chiptime.py): these prefixes contain no pallas
kernels, so `block_until_ready` does NOT sync them on the axon backend —
time them with a fetch-synced scan replication (chiptime.measure_scan or
the single-compile variant in bench.py), never with a bare timing loop.
"""
from __future__ import annotations


def make_prefixes(mcfg, rcfg, H: int, W: int):
    """Returns ordered [(name, fn)]; fn(params, valid, frame) -> f32[].

    Stage deltas: decode+project (front section), cull sort, bin sort,
    instance gather; the full frame (render_field) closes the table with
    the composite.
    """
    import jax
    import jax.numpy as jnp

    from lidargs_tpu.models.field import (
        generate_neural_gaussians, prefilter_anchors,
    )
    from lidargs_tpu.ops.projection import (
        PackedCols, pack_splats, preprocess_gaussians,
    )
    from lidargs_tpu.ops.rasterize import bin_instances, permutation_rows

    C2 = 2
    V = min(rcfg.max_visible, mcfg.anchor_capacity * mcfg.n_offsets)
    gy, gx = rcfg.grid_shape(H, W)

    fl = lambda x: x.reshape((-1,) + x.shape[2:])

    def _pk(p, v, f):
        av = prefilter_anchors(p, v, f, rcfg)
        ng = generate_neural_gaussians(p, v, av, f.center, mcfg,
                                       cam_uid=f.uid)
        # flatten at the projection boundary, exactly like render_field
        return pack_splats(preprocess_gaussians(
            fl(ng.xyz), fl(ng.scaling), fl(ng.rot),
            fl(ng.opacity), fl(ng.feat), fl(ng.mask),
            f.w2s_rot, f.w2s_trans, f.beams, f.W, rcfg))

    def upto_front(p, v, f):
        return jnp.sum(_pk(p, v, f))

    def _pkv(p, v, f):
        pk = _pk(p, v, f)
        _, sel = jax.lax.sort(
            (pk[:, PackedCols.DEPTH],
             jnp.arange(pk.shape[0], dtype=jnp.int32)),
            num_keys=1, is_stable=True)
        return permutation_rows(pk, sel, V)     # production cull path

    def upto_cull(p, v, f):
        return jnp.sum(_pkv(p, v, f))

    def _bins(p, v, f):
        pkv = _pkv(p, v, f)
        ids, counts, ovf = bin_instances(
            pkv[:, PackedCols.rect(C2)].astype(jnp.int32),
            pkv[:, PackedCols.center(C2)],
            pkv[:, PackedCols.validf(C2)] > 0.0, rcfg, gx, gy)
        return pkv, ids, counts, ovf

    def upto_bin(p, v, f):
        _, ids, counts, ovf = _bins(p, v, f)
        return (jnp.sum(ids) + jnp.sum(counts) + ovf).astype(jnp.float32)

    def upto_gather(p, v, f):
        pkv, ids, counts, ovf = _bins(p, v, f)
        inst = jnp.take(pkv, ids.reshape(-1), axis=0, mode="clip")
        return jnp.sum(inst) + jnp.sum(counts) + ovf.astype(jnp.float32)

    return [
        ("front (decode+project)", upto_front),
        ("cull sort", upto_cull),
        ("bin sort", upto_bin),
        ("instance gather", upto_gather),
    ]
