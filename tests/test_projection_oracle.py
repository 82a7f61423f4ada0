"""Randomized cross-check of the production projection against the
independent NumPy oracle (oracle_projection.py — zero shared code).

VERDICT r1 "what's weak #1": every other parity test routes through
preprocess_gaussians itself, so a systematic projection bug would pass the
whole suite. Here the oracle is a scalar float64 transliteration of the
CUDA spec (forward.cu:256-384); any disagreement is a found bug either way.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidargs_tpu.config import RasterConfig
from lidargs_tpu.lidar.beams import kitti_beam_inclinations, uniform_beam_inclinations
from lidargs_tpu.ops.projection import preprocess_gaussians

from oracle_projection import oracle_preprocess_one

CFG = RasterConfig()


def _random_gaussians(key, n, spread=60.0):
    ks = jax.random.split(jax.random.key(key), 5)
    means = jax.random.uniform(ks[0], (n, 3), minval=-spread, maxval=spread)
    scales = jax.random.uniform(ks[1], (n, 3), minval=0.02, maxval=1.5)
    q = jax.random.normal(ks[2], (n, 4))
    quats = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    opac = jax.random.uniform(ks[3], (n,), minval=0.05, maxval=1.0)
    feat = jax.random.normal(ks[4], (n, 2))
    return means, scales, quats, opac, feat


def _pose(seed):
    rng = np.random.default_rng(seed)
    # random rotation via QR + positive diag, random small translation
    A = rng.normal(size=(3, 3))
    Q, R = np.linalg.qr(A)
    Q = Q * np.sign(np.diag(R))
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    t = rng.normal(scale=2.0, size=3)
    return Q.astype(np.float32), t.astype(np.float32)


@pytest.mark.parametrize(
    "beams_name,seed",
    [("uniform", 0), ("kitti", 1), ("uniform", 2)],
)
def test_projection_matches_independent_oracle(beams_name, seed):
    H, W = 32, 512
    if beams_name == "kitti":
        beams = kitti_beam_inclinations(H)
    else:
        beams = uniform_beam_inclinations(10.0, 30.0, H)
    beams = jnp.asarray(beams)
    n = 512
    means, scales, quats, opac, feat = _random_gaussians(seed, n)
    # append elevation-edge cases: above the top beam, below the bottom beam,
    # just inside/outside the divergence margin, plus near/far boundary rows
    bl = np.asarray(beams)
    rda = CFG.ray_divergence_angle
    edges = []
    for alpha_el in (
        bl[-1] + 0.5 * rda, bl[-1] + 2.0 * rda, bl[-1] + 2.1 * rda,
        bl[-1] + 0.1, bl[0] - 0.5 * rda, bl[0] - 2.0 * rda,
        bl[0] - 2.1 * rda, bl[0] - 0.1,
        0.5 * (bl[3] + bl[4]), bl[5],
    ):
        r = 20.0
        edges.append([r * np.cos(alpha_el), 0.1, r * np.sin(alpha_el)])
    for r in (CFG.near * 0.9, CFG.near * 1.1, CFG.far * 0.99, CFG.far * 1.01):
        edges.append([r, 0.05, 0.02])
    means = jnp.concatenate([means, jnp.asarray(np.array(edges, np.float32))])
    extra = len(edges)
    scales = jnp.concatenate([scales, jnp.full((extra, 3), 0.3)])
    quats = jnp.concatenate(
        [quats, jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (extra, 1))]
    )
    opac = jnp.concatenate([opac, jnp.full((extra,), 0.8)])
    feat = jnp.concatenate([feat, jnp.zeros((extra, 2))])
    n += extra

    w2s_rot, w2s_trans = _pose(seed + 100)
    mask = jnp.ones((n,), bool)
    sp = jax.jit(
        lambda m, s, q, o, f: preprocess_gaussians(
            m, s, q, o, f, mask, w2s_rot, w2s_trans, beams, W, CFG
        )
    )(means, scales, quats, opac, feat)

    valid = np.asarray(sp.valid)
    mnp = np.asarray(means, np.float64)
    snp = np.asarray(scales, np.float64)
    qnp = np.asarray(quats, np.float64)
    beams_l = bl.astype(np.float64).tolist()

    n_boundary = 0
    for i in range(n):
        o = oracle_preprocess_one(
            mnp[i], snp[i], qnp[i], np.asarray(w2s_rot, np.float64),
            np.asarray(w2s_trans, np.float64), beams_l, W,
            CFG.far, CFG.near, CFG.ray_divergence_angle, CFG.lowpass,
            block_x=CFG.ref_block_x, block_y=CFG.ref_block_y,
        )
        if (o is None) != (not valid[i]):
            # f32-vs-f64 boundary flips are legitimate (divergence margin,
            # near/far, ceil crossing a radius to the next int): tolerate a
            # tiny count but fail on systematic disagreement
            n_boundary += 1
            continue
        if o is None:
            continue
        loc = f"gaussian {i} ({beams_name}, seed {seed})"
        assert abs(float(sp.depth[i]) - o["depth"]) < 1e-3, loc
        np.testing.assert_allclose(
            np.asarray(sp.sphere_mean[i]), o["sphere_mean"], atol=1e-5, err_msg=loc
        )
        np.testing.assert_allclose(
            np.asarray(sp.u1[i]), o["u1"], atol=1e-5, err_msg=loc
        )
        np.testing.assert_allclose(
            np.asarray(sp.u2[i]), o["u2"], atol=1e-5, err_msg=loc
        )
        # the off-diagonal b can be ~1e-7 of the diagonal: compare at the
        # conic's own scale (f32 cancellation noise, not semantics)
        np.testing.assert_allclose(
            np.asarray(sp.conic[i]), o["conic"],
            atol=2e-3 * float(np.abs(o["conic"]).max()) + 1e-6,
            err_msg=loc,
        )
        np.testing.assert_allclose(
            np.asarray(sp.center[i]), o["center"], atol=2e-3, err_msg=loc
        )
        # radii are ceil() of a float — off-by-one at exact integer crossings
        # is an f32 artifact; demand exact match otherwise
        r_prod = np.asarray(sp.radii_xy[i], np.float64)
        r_or = o["radii_xy"]
        if np.any(np.abs(r_prod - r_or) > 0):
            assert np.all(np.abs(r_prod - r_or) <= 1), loc
            n_boundary += 1
        else:
            rect_prod = np.asarray(sp.pix_rect[i], np.float64)
            np.testing.assert_allclose(rect_prod, o["rect"], atol=0, err_msg=loc)
    assert n_boundary <= max(3, n // 100), (
        f"{n_boundary}/{n} oracle disagreements — systematic, not boundary"
    )


def test_oracle_rejects_beyond_divergence_margin():
    """Pin the asymmetric row-0 / row-(H-1) rejection branches of the spec
    itself (forward.cu:345,356): above top beam rejected past 2*RDA, below
    bottom beam rejected past 2*RDA, both kept just inside."""
    H, W = 16, 256
    beams = np.asarray(uniform_beam_inclinations(10.0, 30.0, H), np.float64)
    rda = 0.002
    eye = np.eye(3)
    zero = np.zeros(3)

    def at_elevation(el):
        r = 20.0
        return oracle_preprocess_one(
            np.array([r * np.cos(el), 0.0, r * np.sin(el)]),
            np.array([0.3, 0.3, 0.3]), np.array([1.0, 0, 0, 0]),
            eye, zero, beams.tolist(), W, 80.0, 0.5, rda, 0.01,
        )

    assert at_elevation(beams[-1] + 1.9 * rda) is not None
    assert at_elevation(beams[-1] + 2.1 * rda) is None
    assert at_elevation(beams[0] - 1.9 * rda) is not None
    assert at_elevation(beams[0] - 2.1 * rda) is None
    # interior row: exact beam hit lands on the (flipped) integer row
    o = at_elevation(float(beams[7]))
    assert o is not None
    np.testing.assert_allclose(o["center"][1], H - 7 - 1, atol=1e-9)
