"""Training augmentations — the reference's 9-transform MONAI pipeline
(dataset_ucsf.py:94-113), re-designed as batched, jit-compiled, stateless-PRNG
device ops.

The reference runs these per-sample on CPU workers; here the whole batch is
augmented on the TPU inside the train step (host does decode+crop only).
RNG never matches MONAI's numpy generator, so parity is *distributional*:
each transform reproduces MONAI's parameter ranges and per-volume apply
probability; per-op math follows MONAI's definitions with the documented
exceptions (zoom interpolation is trilinear rather than 'area'; coarse-hole
corners are uniform over valid positions; the default affine backend warps
with exact LU geometry but six sequential 1-D interps instead of one
trilinear — ~0.3% RMS difference, 106× faster on TPU; set
affine_backend='exact' for single-pass trilinear).

Transform order and parameters (exactly the reference list):
  1. RandFlip        p=0.5,  spatial axis 0
  2. RandRotate90    p=0.2,  k=1, axes (0,1)        [requires D == H]
  3. RandAffine      p=0.2,  rotate U(±0.1 rad)/axis, scale 1+U(±0.1)/axis,
                     trilinear, reflection padding
  4. RandAdjustContrast p=0.3, gamma U(0.7, 1.3)
  5. RandGaussianNoise  p=0.2, std U(0, 0.1)
  6. RandGaussianSmooth p=0.2, sigma_x U(0.5,1.5), sigma_y/z U(0.25,1.5)
  7. RandCoarseShuffle  p=0.2, 5 holes of 20³ (voxels permuted per hole)
  8. RandCoarseDropout  p=0.2, 3 holes of 15³, fill −1
  9. RandZoom           p=0.2, isotropic U(0.9, 1.1), keep_size (edge pad)

Applied independently per (batch, modality) volume, like the reference's
per-modality transform calls (dataset_ucsf.py:150-155).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class AugmentConfig:
    flip_prob: float = 0.5
    rot90_prob: float = 0.2
    affine_prob: float = 0.2
    affine_rotate: float = 0.1
    affine_scale: float = 0.1
    # 'lu' = gather-free LU-factored warp (fast TPU path, default);
    # 'exact' = single-pass trilinear map_coordinates (semantics reference)
    affine_backend: str = "lu"
    contrast_prob: float = 0.3
    gamma_low: float = 0.7
    gamma_high: float = 1.3
    noise_prob: float = 0.2
    noise_std: float = 0.1
    smooth_prob: float = 0.2
    sigma_x: tuple[float, float] = (0.5, 1.5)
    sigma_yz: tuple[float, float] = (0.25, 1.5)
    shuffle_prob: float = 0.2
    shuffle_holes: int = 5
    shuffle_size: tuple[int, int, int] = (20, 20, 20)
    dropout_prob: float = 0.2
    dropout_holes: int = 3
    dropout_size: tuple[int, int, int] = (15, 15, 15)
    dropout_fill: float = -1.0
    zoom_prob: float = 0.2
    zoom_low: float = 0.9
    zoom_high: float = 1.1


def _maybe(key, prob, fn, vol, use_cond: bool = False):
    """Apply fn with probability prob.

    use_cond=False: both branches traced and executed, jnp.where selects —
    the right shape under vmap (where cond lowers to select anyway).
    use_cond=True: real lax.cond branch — under lax.map (scan) the untaken
    branch is NOT executed, so a p=0.2 transform costs its expected value
    instead of 1× per volume.  Identical randomness either way (same key
    splits), so both modes produce the same augmented batch."""
    k_apply, k_fn = jax.random.split(key)
    applied = jax.random.bernoulli(k_apply, prob)
    if use_cond:
        return jax.lax.cond(applied, lambda: fn(k_fn, vol), lambda: vol)
    return jnp.where(applied, fn(k_fn, vol), vol)


# --- geometric -------------------------------------------------------------

def _flip0(key, vol):
    return jnp.flip(vol, axis=0)


def _rot90(key, vol):
    # MONAI RandRotate90(max_k=1) always uses k=1 on axes (0,1)
    return jnp.rot90(vol, k=1, axes=(0, 1))


def _affine_matrix(cfg: AugmentConfig, key):
    """Traced sampling matrix: MONAI AffineGrid rotates then scales
    (affine = R @ S), output-grid coordinates centered on the volume center,
    inverse-free sampling (reference dataset_ucsf.py:97-104 params)."""
    k_rot, k_scale = jax.random.split(key)
    ang = jax.random.uniform(k_rot, (3,), minval=-cfg.affine_rotate,
                             maxval=cfg.affine_rotate)
    scale = 1.0 + jax.random.uniform(k_scale, (3,), minval=-cfg.affine_scale,
                                     maxval=cfg.affine_scale)
    cx, cy, cz = jnp.cos(ang[0]), jnp.cos(ang[1]), jnp.cos(ang[2])
    sx, sy, sz = jnp.sin(ang[0]), jnp.sin(ang[1]), jnp.sin(ang[2])
    rx = jnp.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    ry = jnp.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    rz = jnp.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return rx @ ry @ rz @ jnp.diag(scale)


def _affine(cfg: AugmentConfig):
    """Exact single-pass trilinear affine via map_coordinates.

    TPU cost warning: the 8 corner gathers run at ~14 ms per 1M-voxel gather
    on v5e (measured) — ~117 ms per (128,128,64) volume.  This is the
    semantics-reference backend; the default 'lu' backend below is
    gather-free and ~6× faster with near-identical output."""
    def f(key, vol):
        D, H, W = vol.shape
        m = _affine_matrix(cfg, key)
        center = jnp.array([(D - 1) / 2.0, (H - 1) / 2.0, (W - 1) / 2.0])
        ii, jj, kk = jnp.meshgrid(jnp.arange(D), jnp.arange(H), jnp.arange(W),
                                  indexing="ij")
        coords = jnp.stack([ii.ravel(), jj.ravel(), kk.ravel()]).astype(jnp.float32)
        src = m.astype(jnp.float32) @ (coords - center[:, None]) + center[:, None]
        out = jax.scipy.ndimage.map_coordinates(
            vol, [src[0].reshape(D, H, W), src[1].reshape(D, H, W),
                  src[2].reshape(D, H, W)], order=1, mode="reflect")
        return out
    return f


def _lu_row_bounds(cfg: AugmentConfig):
    """Per-pass |cdelta| bounds (lmax, umax) = max |L − I| / |U − I| over the
    WHOLE (angle, scale) parameter box, scanned numerically on the box's
    corner/midpoint grid (the trig entries are monotone or even on [-r, r],
    so extremes live there)."""
    import numpy as np

    r, sc = cfg.affine_rotate, cfg.affine_scale
    lmax = np.zeros((3, 3))
    umax = np.zeros((3, 3))
    for ax in np.ndindex(3, 3, 3):
        ang = np.array([(-r, 0.0, r)[a] for a in ax])
        for sgn in np.ndindex(2, 2, 2):
            s = 1.0 + np.array([(-sc, sc)[g] for g in sgn])
            cx, cy, cz = np.cos(ang)
            sx, sy, sz = np.sin(ang)
            rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
            ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
            rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
            m = rx @ ry @ rz @ np.diag(s)
            # Doolittle LU (no pivoting; m is near-identity)
            l10, l20 = m[1, 0] / m[0, 0], m[2, 0] / m[0, 0]
            u11 = m[1, 1] - l10 * m[0, 1]
            u12 = m[1, 2] - l10 * m[0, 2]
            l21 = (m[2, 1] - l20 * m[0, 1]) / u11
            u22 = m[2, 2] - l20 * m[0, 2] - l21 * u12
            L = np.array([[1, 0, 0], [l10, 1, 0], [l20, l21, 1.0]])
            U = np.array([[m[0, 0], m[0, 1], m[0, 2]], [0, u11, u12],
                          [0, 0, u22]])
            lmax = np.maximum(lmax, np.abs(L - np.eye(3)))
            umax = np.maximum(umax, np.abs(U - np.eye(3)))
    return lmax, umax


def _lu_windows(cfg: AugmentConfig, shape) -> tuple:
    """Static per-pass displacement windows for the LU affine backend.

    The warp geometry m = L@U is drawn at run time, but Pallas/XLA need
    static slice extents — so bound each pass's displacement over the whole
    parameter box (_lu_row_bounds), then add one interpolation voxel + one
    margin voxel."""
    import numpy as np

    h = np.array([(s - 1) / 2.0 for s in shape])
    lmax, umax = _lu_row_bounds(cfg)

    def win(dev_row):
        return int(np.ceil(float(dev_row @ h) * 1.05)) + 2
    l_wins = tuple(win(lmax[a]) for a in range(3))
    u_wins = tuple(win(umax[a]) for a in range(3))
    # fused axis-2 pass (see _affine_lu): source = c2 + l20·Δ0 + l21·Δ1 +
    # u22·Δ2 — its displacement bound is the combined L-row-2 + U-row-2
    fused2 = win(lmax[2] + umax[2])
    return l_wins, u_wins, fused2


def _lu_spans(cfg: AugmentConfig, shape, block: int = 32) -> tuple:
    """Static per-pass ACTIVE-tap bounds for the Pallas kernel's runtime tap
    base (kernels/resample.py span): within one output tile, rel varies by
    at most Σ_b |cdelta_b|·(tile_extent_b − 1), so only ~that many adjacent
    taps of the full worst-case window can have nonzero hat weight.  The
    kernel's tile keeps the resample AXIS dim and the lane dim (2) whole and
    blocks the remaining dim(s) of {0, 1} at `block`.
    Returns (span_l1, span_fused2, span_u1, span_u0)."""
    import numpy as np

    lmax, umax = _lu_row_bounds(cfg)

    def span(row, axis):
        ext = [float(shape[0] - 1), float(shape[1] - 1), float(shape[2] - 1)]
        for dim in (0, 1):
            if dim != axis:
                ext[dim] = float(min(block, shape[dim]) - 1)
        return int(np.ceil(float(row @ np.array(ext)) * 1.05)) + 3
    return (span(lmax[1], 1), span(lmax[2] + umax[2], 2), span(umax[1], 1),
            span(umax[0], 0))


def _resample_axis_windowed(vol, axis: int, coefs, center, window: int):
    """Gather-free 1-D linear resample along `axis` at source positions
    p(x) = center[axis] + Σ_b coefs[b]·(x_b − center[b]):

        out[x] = Σ_{δ=−K..K+1} hat(p(x) − x_axis − δ) · vol[x + δ·e_axis]

    The hat weights are elementwise (VPU) and the shifted copies are static
    slices of a symmetric-padded volume (scipy map_coordinates
    mode='reflect' boundary) — no gathers, which on TPU run ~14 ms per
    1M-voxel lookup vs ~0.15 ms per windowed tap."""
    shape = vol.shape
    rel = None
    for b in range(3):
        g = jnp.arange(shape[b], dtype=jnp.float32) - center[b]
        c = coefs[b] - (1.0 if b == axis else 0.0)
        term = c * g.reshape([-1 if i == b else 1 for i in range(3)])
        rel = term if rel is None else rel + term
    pad = [(0, 0)] * 3
    pad[axis] = (window, window + 1)
    padded = jnp.pad(vol, pad, mode="symmetric")
    out = jnp.zeros_like(vol)
    for d in range(-window, window + 2):
        shifted = jax.lax.slice_in_dim(padded, d + window,
                                       d + window + shape[axis], axis=axis)
        w = jnp.maximum(0.0, 1.0 - jnp.abs(rel - d))
        out = out + w * shifted
    return out


def _affine_lu(cfg: AugmentConfig):
    """Gather-free affine: factor the sampling matrix m = L·U (Doolittle, no
    pivoting — m is near-identity at the live parameter ranges) and apply the
    two triangular warps as sequences of axis-aligned 1-D linear resamples
    (exact for triangular warps: each pass's source position only needs
    coordinates already in output space — L runs axes 0→1→2, U runs 2→1→0,
    and W_U∘W_L = W_{LU} = W_m).

    Deviation from the 'exact' backend (documented, like zoom's
    trilinear-vs-area): the warp GEOMETRY is exact, but interpolation is six
    sequential 1-D linear interps instead of one trilinear — slightly more
    smoothing (~1e-2 relative on MRI-scale data, see test_augment).  ~6×
    faster on TPU because it never emits a gather."""
    def f(key, vol):
        m = _affine_matrix(cfg, key)
        center = tuple((s - 1) / 2.0 for s in vol.shape)
        l_wins, u_wins, fused2 = _lu_windows(cfg, vol.shape)

        l10, l20 = m[1, 0] / m[0, 0], m[2, 0] / m[0, 0]
        u11 = m[1, 1] - l10 * m[0, 1]
        u12 = m[1, 2] - l10 * m[0, 2]
        l21 = (m[2, 1] - l20 * m[0, 1]) / u11
        u22 = m[2, 2] - l20 * m[0, 2] - l21 * u12

        out = vol
        # L warp: row 0 is identity (skip); axis 1
        out = _resample_axis_windowed(out, 1, (l10, 1.0, 0.0), center,
                                      l_wins[1])
        # fused L-axis-2 ∘ U-axis-2 pass (r5): the two adjacent axis-2
        # resamples compose into ONE — the outer pass reads the inner at
        # x2' = c2 + u22·Δ2 and the inner reads the volume at
        # c2 + l20·Δ0 + l21·Δ1 + (x2'−c2), so the net source is
        # c2 + l20·Δ0 + l21·Δ1 + u22·Δ2 (Δb = x_b − c_b; axes 0/1 are
        # untouched by both).  Same geometry, one less full-volume pass and
        # one less linear-interp smoothing (strictly closer to the exact
        # trilinear backend).
        out = _resample_axis_windowed(out, 2, (l20, l21, u22), center,
                                      fused2)
        # U warp: remaining axes 1, 0
        out = _resample_axis_windowed(out, 1, (0.0, u11, u12), center,
                                      u_wins[1])
        out = _resample_axis_windowed(out, 0, (m[0, 0], m[0, 1], m[0, 2]),
                                      center, u_wins[0])
        return out
    return f


def _affine_lu_batched(cfg: AugmentConfig):
    """Batched LU affine over (V, D, H, W) volumes via the Pallas windowed
    resample kernel (kernels/resample.py) — same warp sequence, matrices and
    tap math as _affine_lu, but each pass reads HBM once instead of staging
    ~2K+2 shifted copies (XLA's lowering is tap-count-independent ~12 ms per
    pass at 33 volumes; the kernel is VMEM-resident).  Key-per-volume
    derivation matches the per-volume path exactly."""
    from ..kernels.resample import resample_axis_windowed_batched as _rs

    def f(keys: jax.Array, vols: jax.Array) -> jax.Array:
        shape = vols.shape[1:]
        center = tuple((s - 1) / 2.0 for s in shape)
        l_wins, u_wins, fused2 = _lu_windows(cfg, shape)
        spans = _lu_spans(cfg, shape)
        m = jax.vmap(lambda k: _affine_matrix(cfg, k))(keys)  # (V, 3, 3)

        l10, l20 = m[:, 1, 0] / m[:, 0, 0], m[:, 2, 0] / m[:, 0, 0]
        u11 = m[:, 1, 1] - l10 * m[:, 0, 1]
        u12 = m[:, 1, 2] - l10 * m[:, 0, 2]
        l21 = (m[:, 2, 1] - l20 * m[:, 0, 1]) / u11
        u22 = m[:, 2, 2] - l20 * m[:, 0, 2] - l21 * u12
        one = jnp.ones_like(l10)
        zero = jnp.zeros_like(l10)

        def cd(c0, c1, c2, axis):
            e = jnp.zeros((3,), jnp.float32).at[axis].set(1.0)
            return jnp.stack([c0, c1, c2], axis=-1) - e

        out = vols
        # L axis 1; fused axis-2 (L∘U, see _affine_lu); U axes 1, 0 —
        # 4 kernel passes instead of 5, each with a dynamic tap base
        # (kernels/resample.py span — the per-tile active-tap bound)
        out = _rs(out, 1, cd(l10, one, zero, 1), center, l_wins[1],
                  span=spans[0])
        out = _rs(out, 2, cd(l20, l21, u22, 2), center, fused2,
                  span=spans[1])
        out = _rs(out, 1, cd(zero, u11, u12, 1), center, u_wins[1],
                  span=spans[2])
        out = _rs(out, 0, cd(m[:, 0, 0], m[:, 0, 1], m[:, 0, 2], 0), center,
                  u_wins[0], span=spans[3])
        return out

    return f


def _zoom_matrix(size: int, z) -> jax.Array:
    """1-D linear-interpolation matrix A (size, size) for keep-size zoom by
    traced factor z about the center, edge-clamped ('nearest' boundary):
    out = A @ signal.  Axis-aligned zoom is separable, so the 3-D resample
    becomes three dense matmuls on the MXU instead of 8-way gathers — the
    gather formulation cost ~350 ms/batch on TPU, this is ~ms."""
    c = (size - 1) / 2.0
    i = jnp.arange(size, dtype=jnp.float32)
    src = (i - c) / z + c
    src = jnp.clip(src, 0.0, size - 1.0)
    lo = jnp.floor(src)
    frac = src - lo
    lo_i = lo.astype(jnp.int32)
    hi_i = jnp.minimum(lo_i + 1, size - 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (size, size), 1)
    a = (cols == lo_i[:, None]) * (1.0 - frac[:, None]) \
        + (cols == hi_i[:, None]) * frac[:, None]
    # lo == hi at the clamped edge double-counts; renormalize rows
    return a / jnp.sum(a, axis=1, keepdims=True)


def _zoom(cfg: AugmentConfig):
    def f(key, vol):
        D, H, W = vol.shape
        z = jax.random.uniform(key, (), minval=cfg.zoom_low, maxval=cfg.zoom_high)
        # precision='highest': default TPU f32 matmul passes cost ~3e-2
        # absolute error on unit-scale data; full-precision passes are exact
        # to 1e-6 and still ~3 ms per 9-volume batch
        out = jnp.einsum("ab,bhw->ahw", _zoom_matrix(D, z), vol,
                         precision="highest")
        out = jnp.einsum("ab,dbw->daw", _zoom_matrix(H, z), out,
                         precision="highest")
        out = jnp.einsum("ab,dhb->dha", _zoom_matrix(W, z), out,
                         precision="highest")
        return out.astype(vol.dtype)
    return f


# --- intensity ----------------------------------------------------------------

def _contrast(cfg: AugmentConfig):
    def f(key, vol):
        gamma = jax.random.uniform(key, (), minval=cfg.gamma_low,
                                   maxval=cfg.gamma_high)
        vmin = jnp.min(vol)
        vrange = jnp.max(vol) - vmin
        # MONAI AdjustContrast: ((x-min)/(range+eps))**gamma * range + min
        return ((vol - vmin) / (vrange + 1e-7)) ** gamma * vrange + vmin
    return f


def _noise(cfg: AugmentConfig):
    def f(key, vol):
        k_std, k_n = jax.random.split(key)
        std = jax.random.uniform(k_std, (), minval=0.0, maxval=cfg.noise_std)
        return vol + std * jax.random.normal(k_n, vol.shape)
    return f


def _gaussian_kernel(sigma, radius: int):
    """MONAI erf-form discrete Gaussian: 0.5·(erf((x+.5)/σ√2) − erf((x−.5)/σ√2)),
    clamped ≥0.  Static radius; tails vanish for small σ."""
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    s = sigma * jnp.sqrt(2.0)
    k = 0.5 * (jax.scipy.special.erf((x + 0.5) / s) -
               jax.scipy.special.erf((x - 0.5) / s))
    k = jnp.maximum(k, 0.0)
    return k / jnp.sum(k)


def _smooth(cfg: AugmentConfig):
    radius = int(4 * max(cfg.sigma_x[1], cfg.sigma_yz[1]) + 0.5)

    def f(key, vol):
        ks = jax.random.split(key, 3)
        sigmas = [jax.random.uniform(ks[0], (), minval=cfg.sigma_x[0],
                                     maxval=cfg.sigma_x[1]),
                  jax.random.uniform(ks[1], (), minval=cfg.sigma_yz[0],
                                     maxval=cfg.sigma_yz[1]),
                  jax.random.uniform(ks[2], (), minval=cfg.sigma_yz[0],
                                     maxval=cfg.sigma_yz[1])]
        # Each separable 1-D pass is a banded (Toeplitz) matrix contraction
        # on the MXU rather than a lax.conv: a C=1 conv lowers to VPU-bound
        # sliding windows (~8 ms at the config-4 gating cap), while the
        # (S,S) band matrix — built from static offset eyes weighted by the
        # traced kernel taps — makes each pass a dense batched GEMM
        # (~18 GFLOP total at that cap: sub-ms).  Same math: B[i,j] =
        # k[j-i+r] reproduces the conv's zero padding exactly; bf16
        # operands, f32 accumulation, like every matmul in the framework.
        out = vol
        subs = ("ij,jhw->ihw", "ij,djw->diw", "ij,dhj->dhi")
        for axis, sigma in enumerate(sigmas):
            kern = _gaussian_kernel(sigma, radius)
            size = vol.shape[axis]
            band = sum(kern[d + radius] * jnp.eye(size, k=d, dtype=jnp.float32)
                       for d in range(-radius, radius + 1))
            out = jnp.einsum(subs[axis], band.astype(vol.dtype), out,
                             preferred_element_type=jnp.float32).astype(vol.dtype)
        return out
    return f


# --- coarse (hole-based) -----------------------------------------------------

def _hole_corners(key, shape, hole_size, n):
    ks = jax.random.split(key, 3)
    return [jax.random.randint(ks[i], (n,), 0, max(shape[i] - hole_size[i], 0) + 1)
            for i in range(3)]


def _clip_hole(hs, shape):
    """MONAI clips holes to the image bounds; with static shapes that is a
    trace-time min per dim."""
    return tuple(min(h, s) for h, s in zip(hs, shape))


def _coarse_dropout(cfg: AugmentConfig):
    def f(key, vol):
        hs = _clip_hole(cfg.dropout_size, vol.shape)
        corners = _hole_corners(key, vol.shape, hs, cfg.dropout_holes)
        block = jnp.full(hs, cfg.dropout_fill, vol.dtype)

        def body(i, v):
            return jax.lax.dynamic_update_slice(
                v, block, (corners[0][i], corners[1][i], corners[2][i]))
        return jax.lax.fori_loop(0, cfg.dropout_holes, body, vol)
    return f


def _coarse_shuffle(cfg: AugmentConfig):
    def f(key, vol):
        hs = _clip_hole(cfg.shuffle_size, vol.shape)
        k_c, k_p = jax.random.split(key)
        corners = _hole_corners(k_c, vol.shape, hs, cfg.shuffle_holes)
        # Shuffle = stable sort of the hole's voxels under fresh uniform
        # uint32 keys: distributionally a uniform permutation (up to the
        # ~n²/2³³ ≈ 0.7%-per-hole chance of a key collision, where stability
        # keeps that PAIR in input order — irrelevant for augmentation
        # noise).  A sort's compare-exchanges are regular strided VPU work;
        # the gather `block.ravel()[perm]` it replaces costs ~14 ms/M
        # elements on TPU (4× slower at this geometry, measured v5e).
        bits = jax.vmap(lambda k: jax.random.bits(
            k, (hs[0] * hs[1] * hs[2],), dtype=jnp.uint32))(
                jax.random.split(k_p, cfg.shuffle_holes))

        def body(i, v):
            start = (corners[0][i], corners[1][i], corners[2][i])
            block = jax.lax.dynamic_slice(v, start, hs)
            _, shuffled = jax.lax.sort_key_val(bits[i], block.ravel())
            return jax.lax.dynamic_update_slice(v, shuffled.reshape(hs), start)
        return jax.lax.fori_loop(0, cfg.shuffle_holes, body, vol)
    return f


# --- pipeline ------------------------------------------------------------------

def _steps(cfg: AugmentConfig) -> list:
    """(prob, fn, expensive) triples in reference order (dataset_ucsf.py:94-113).
    `expensive` marks transforms worth compaction-gating in batch mode —
    measured per-step cost at 64×(128,128,64) volumes on v5e: affine_lu
    88 ms, coarse_shuffle 41 ms, smooth 12 ms, zoom 6 ms vs ≤5 ms for the
    rest (whose gather/scatter overhead would eat the gain).  The lu affine
    additionally carries a `.batched` implementation (Pallas kernel) the
    batch pipeline prefers over vmap-of-per-volume."""
    if cfg.affine_backend == "lu":
        affine = _affine_lu(cfg)
        affine.batched = _affine_lu_batched(cfg)
    else:
        affine = _affine(cfg)
    return [
        (cfg.flip_prob, _flip0, False),
        (cfg.rot90_prob, _rot90, False),
        (cfg.affine_prob, affine, True),
        (cfg.contrast_prob, _contrast(cfg), False),
        (cfg.noise_prob, _noise(cfg), False),
        (cfg.smooth_prob, _smooth(cfg), True),
        (cfg.shuffle_prob, _coarse_shuffle(cfg), True),
        (cfg.dropout_prob, _coarse_dropout(cfg), False),
        (cfg.zoom_prob, _zoom(cfg), True),
    ]


def augment_volume(key: jax.Array, vol: jax.Array,
                   cfg: AugmentConfig = AugmentConfig(),
                   use_cond: bool = False) -> jax.Array:
    """Apply the 9-transform pipeline to one (D, H, W) volume."""
    if cfg.rot90_prob > 0 and vol.shape[0] != vol.shape[1]:
        raise ValueError("RandRotate90 on axes (0,1) needs D == H "
                         f"(got {vol.shape})")
    keys = jax.random.split(key, len(_steps(cfg)))
    for k, (prob, fn, _) in zip(keys, _steps(cfg)):
        if prob > 0:
            vol = _maybe(k, prob, fn, vol, use_cond=use_cond)
    return vol


def _compact_cap(n_volumes: int, prob: float, sigmas: float = 2.5) -> int:
    """Fixed prefix size for compaction-gating: mean + `sigmas`·σ of the
    Binomial draw count (+1).  Round 2 used 6σ so overflow could be silently
    ignored (P < 1e-9), which left the cap at ~50-75% of the batch at live
    sizes — the Binomial tail ate most of the gating win.  Round 3 pairs a
    tight 2.5σ cap (~0.6% overflow per step) with an exact lax.cond dense
    fallback in _augment_batch_compact, so the cap only sets the FAST path's
    cost and correctness never depends on it."""
    import math

    mean = n_volumes * prob
    sigma = math.sqrt(n_volumes * prob * (1.0 - prob))
    return min(n_volumes, int(math.ceil(mean + sigmas * sigma)) + 1)


def _augment_batch_compact(keys: jax.Array, flat: jax.Array,
                           cfg: AugmentConfig, gate: bool = True) -> jax.Array:
    """Batch-stepped pipeline with compaction-gating of expensive transforms.

    Per step, the volumes that drew the transform (Bernoulli per volume,
    SAME key derivation as augment_volume, so draws/parameters match
    mode='vmap' exactly; values agree to the last ulp — the lax.cond
    wrapper fuses FMAs slightly differently) are argsort-compacted to the
    front and only a fixed
    `_compact_cap` prefix runs the transform — row gathers/scatters of whole
    volumes are contiguous DMA-shaped copies (~0.6 ms per 128 MB), unlike
    the per-element gathers TPUs hate.  A p=0.2 transform thus costs ~cap/B
    of its dense cost while keeping full vmap parallelism (the lax.cond
    'scan' mode serializes volumes and loses on net).  The rare draw that
    overflows the cap (P ≈ 0.6%/step) takes an exact dense fallback branch
    via lax.cond, so correctness never depends on the cap choice."""
    steps = _steps(cfg)
    step_keys = jax.vmap(lambda k: jax.random.split(k, len(steps)))(keys)
    n = flat.shape[0]
    for s, (prob, fn, expensive) in enumerate(steps):
        if prob <= 0:
            continue
        ks = jax.vmap(jax.random.split)(step_keys[:, s])  # (V, 2) keys
        k_apply, k_fn = ks[:, 0], ks[:, 1]
        applied = jax.vmap(lambda k: jax.random.bernoulli(k, prob))(k_apply)
        batched = getattr(fn, "batched", None)

        def run(sub_keys, sub_vols):
            # transforms may compute internally in f32 (pow/noise/conv/Pallas
            # resample); the PIPELINE dtype (= input dtype) is restored at
            # every step boundary so bf16 batches keep bf16-sized gathers,
            # scatters, selects and conditional buffers (the dominant aug
            # cost — see docs/PERF_r03.md)
            if batched is not None:
                return batched(sub_keys, sub_vols).astype(sub_vols.dtype)
            return jax.vmap(fn)(sub_keys, sub_vols).astype(sub_vols.dtype)

        cap = _compact_cap(n, prob) if (gate and expensive) else n
        if cap >= n:
            out = run(k_fn, flat)
            flat = jnp.where(applied[:, None, None, None], out, flat)
        else:
            def gated(flat):
                order = jnp.argsort(jnp.logical_not(applied))  # selected first
                sel = order[:cap]
                sub = flat[sel]
                out_sub = run(k_fn[sel], sub)
                merged = jnp.where(applied[sel][:, None, None, None],
                                   out_sub, sub)
                return flat.at[sel].set(merged)

            def dense(flat):
                out = run(k_fn, flat)
                return jnp.where(applied[:, None, None, None], out, flat)

            # exact overflow handling: the ~0.6%-probability draw where more
            # than `cap` volumes selected the transform takes the dense
            # branch — same keys and kernels either way (values to the last
            # ulp), the cap only bounds the fast path's cost
            flat = jax.lax.cond(jnp.sum(applied) <= cap, gated, dense, flat)
    return flat


def augment_batch(key: jax.Array, imgs: jax.Array,
                  cfg: AugmentConfig = AugmentConfig(),
                  mode: str = "compact") -> jax.Array:
    """Augment a (B, M, C, D, H, W) batch; independent randomness per
    (batch, modality) volume, matching the reference's per-modality
    transform calls (dataset_ucsf.py:150-155).

    mode='compact' (default): batch-stepped vmap with compaction-gating of
    the expensive p<1 transforms (see _augment_batch_compact) — same draws
    and parameters as 'vmap' (same key derivation; values to the last ulp)
    at ~cap/B of the cost for the gated steps.
    mode='vmap': one fused SIMD program over all volumes; every transform
    executes for every volume and jnp.where selects — maximal parallelism,
    5× the expected-value FLOPs for the p=0.2 transforms.
    mode='scan': lax.map over volumes with REAL lax.cond branches — each
    transform runs only for the ~p fraction of volumes that drew it.  Same
    keys → same randomness; outputs match 'vmap' to float tolerance (XLA
    fuses the two lowerings differently).

    Measured on v5e, batch 8×3 volumes of (128,128,64), lu affine backend:
    vmap 61 ms, scan 106 ms — cond gating under lax.map serializes volumes
    and loses to vmap's parallelism; compaction gating keeps the
    parallelism AND most of the expected-value saving (batch 32×2: vmap
    153 ms → compact 98 ms; ~6 ms gather/scatter overhead per gated step
    eats the rest).  (With the 'exact' affine backend the ordering flips
    hard: vmap 3368 ms, scan ~500 ms — gathers are that bad on TPU.)"""
    B, M, C, D, H, W = imgs.shape
    flat = imgs.reshape(B * M * C, D, H, W)
    keys = jax.random.split(key, flat.shape[0])
    if mode == "scan":
        # the per-volume path mixes f32 internals freely; run it in f32 and
        # restore the caller's dtype (scan mode is the small-model/debug path)
        out = jax.lax.map(
            lambda kv: augment_volume(kv[0], kv[1], cfg, use_cond=True),
            (keys, flat.astype(jnp.float32))).astype(flat.dtype)
    elif mode == "compact":
        out = _augment_batch_compact(keys, flat, cfg)
    else:
        # dense batch-stepped pipeline (gating off) — same kernels and key
        # derivation as 'compact', so the two stay bit-identical
        out = _augment_batch_compact(keys, flat, cfg, gate=False)
    return out.reshape(imgs.shape)
