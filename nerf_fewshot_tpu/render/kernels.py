"""Fused Pallas TPU ray-march kernels.

The training/render hot path of the reference is per-point MLP evaluation
followed by an alpha-compositing scan (reference: src/models/nerf_model.py:
16-24 + src/models/nerf_mlp.py:185-215, dispatched op-by-op in eager torch).
Under plain XLA each trunk matmul round-trips its (points × 256) activation
through HBM — at the flagship shapes that activation traffic, not MXU FLOPs,
bounds throughput. These kernels keep the whole trunk + compositing resident
in VMEM per ray tile:

* ``fused_render`` — forward: for each tile of R_T rays × S samples, run the
  encoded inputs through the n-layer ReLU trunk (weights held in VMEM across
  the whole grid), apply the rgb(sigmoid)/sigma heads, convert to alpha, and
  composite via an exclusive-cumprod implemented as a lower-triangular
  log-cumsum **matmul** (MXU-friendly, no sequential scan), yielding
  rgb/depth/acc per ray.
* custom VJP — backward: per tile, recompute the forward (activations stay
  in VMEM), backprop the compositing analytically (suffix sums as triangular
  matmuls), backprop the trunk, and accumulate weight gradients across the
  sequential TPU grid into aliased output blocks.

Parity: bit-compatible with the XLA pipeline (ops.composite/volume_render and
models.mlp.NeRFMLP) — the equivalence is pinned by tests (interpret mode on
CPU, compiled on TPU). Constants (1e10 far delta, 1e-10 transmittance
epsilon, ReLU-before-alpha) match the reference exactly.

Layout notes (TPU):
* input features are zero-padded to D_pad=128 lanes; trunk width H must be a
  multiple of 128 (256 for every reference config);
* heads are packed into one (H, 128) matmul whose first 4 columns are
  [r, g, b, sigma] — one MXU op instead of two skinny ones;
* the sample axis S rides the lane dimension during compositing; tile sizes
  default to R_T=64 rays (S=64 → 4096 points/tile) for the forward and 32
  for the backward (which additionally holds all layer activations).
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

D_PAD = 128  # padded input-feature lanes
OUT_PAD = 128  # padded head output lanes ([r,g,b,sigma] in cols 0..3)


def _tri_incl(S: int, dtype) -> jnp.ndarray:
    """(S, S) lower-triangular ones (j <= i): row i sums entries up to i."""
    i = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
    return (j <= i).astype(dtype)


def _tri_after(S: int, dtype) -> jnp.ndarray:
    """(S, S) strict upper (j > i): row i sums entries strictly after i."""
    i = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
    return (j > i).astype(dtype)


def _dot(a, b, compute_dtype):
    """Matmul with f32 accumulation; optionally bf16 inputs (single-pass MXU
    instead of the 3-pass f32 decomposition — ~3× the matmul rate).

    ``compute_dtype``:
      * ``"float32"`` (default) — Mosaic still truncates the inputs to ONE
        bf16 pass per dot (the documented in-kernel semantic), matching
        XLA's own TPU DEFAULT matmul behavior. This is the perf mode.
      * ``"bfloat16"`` — explicit bf16 casts; numerically identical to
        float32-DEFAULT on TPU (pinned by tests/test_tpu_numerics.py).
      * ``"highest"`` — exact-f32 dots (``Precision.HIGHEST`` 3-pass
        decomposition) on EVERY in-kernel matmul. ~2-3× step time; the
        kernel then computes the same function as CPU-f32, which matters
        at knife-edge states where both bf16 paths sit far from the f32
        function (RESULTS.md round-5 equidistance measurement). Use for
        debugging/verification, or recipes whose training dynamics are
        chaos-sensitive to matmul rounding.
    """
    if compute_dtype == "highest":
        return jnp.dot(a, b, precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)
    if compute_dtype == "bfloat16":
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _mlp_forward(x, w0, b0, wh, bh, wout, bout, save_acts=False,
                 compute_dtype="float32"):
    """Trunk + packed heads. x: (N, D_PAD). Returns (out4 (N, OUT_PAD),
    acts list) — acts[l] is the input to layer l (post-ReLU of l-1)."""
    acts = [x] if save_acts else None
    h = jnp.maximum(_dot(x, w0, compute_dtype) + b0, 0.0)
    n_hidden = wh.shape[0]
    for l in range(n_hidden):
        if save_acts:
            acts.append(h)
        h = jnp.maximum(_dot(h, wh[l], compute_dtype) + bh[l], 0.0)
    if save_acts:
        acts.append(h)
    out = _dot(h, wout, compute_dtype) + bout
    return out, acts


def _composite(sigma, z, dnorm, white_bkgd):
    """alpha-composite raw sigma: returns (alpha, trans, weights).

    sigma/z: (R, S); dnorm: (R, 1). Exact reference math
    (nerf_mlp.py:185-205) with the cumprod done in log space via a
    triangular matmul."""
    R, S = sigma.shape
    dists = jnp.concatenate(
        [z[:, 1:] - z[:, :-1], jnp.full((R, 1), 1e10, z.dtype)], axis=1
    )
    dists = dists * dnorm
    ealpha = jnp.exp(-jnp.maximum(sigma, 0.0) * dists)  # = 1 - alpha
    alpha = 1.0 - ealpha
    # om == 1 - alpha + 1e-10, but built as a single add of positives so no
    # float reassociation can cancel the epsilon (log(om) must stay finite).
    om = ealpha + 1e-10
    logs = jnp.log(om)
    # exclusive cumsum: inclusive (tri) minus self. HIGHEST precision: Mosaic
    # dots truncate f32 inputs to ONE bf16 pass by default (measured: max rel
    # err == bf16 rounding), and log-space transmittances amplify that to ~1%
    # errors in trans — and catastrophic cancellation in the backward's
    # suffix sums (sigma-head grads measured 155× off truth on-chip). The
    # (N, S)×(S, S) contraction is noise next to the MLP matmuls, so exact
    # f32 costs nothing measurable.
    incl = jnp.dot(logs, _tri_incl(S, logs.dtype).T,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    trans = jnp.exp(incl - logs)
    weights = alpha * trans
    return alpha, om, dists, trans, weights


def _fwd_kernel(
    x_ref, z_ref, dnorm_ref, w0_ref, b0_ref, wh_ref, bh_ref, wout_ref,
    bout_ref, rgb_ref, depth_ref, acc_ref, weights_ref, *, S, white_bkgd,
    compute_dtype,
):
    R = z_ref.shape[0]
    out, _ = _mlp_forward(
        x_ref[:], w0_ref[:], b0_ref[:], wh_ref[:], bh_ref[:], wout_ref[:],
        bout_ref[:], compute_dtype=compute_dtype,
    )
    rgb_s = jax.nn.sigmoid(out[:, 0:3]).reshape(R, S, 3)
    sigma = out[:, 3].reshape(R, S)
    z = z_ref[:]
    _, _, _, _, weights = _composite(sigma, z, dnorm_ref[:], white_bkgd)
    rgb_map = jnp.sum(weights[..., None] * rgb_s, axis=1)
    acc = jnp.sum(weights, axis=1, keepdims=True)
    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc)
    rgb_ref[:] = rgb_map
    depth_ref[:] = jnp.sum(weights * z, axis=1, keepdims=True)
    acc_ref[:] = acc
    weights_ref[:] = weights



def _phases_exact(raw, e2, c):
    """Exact-f32 phase matrix for the inline PE: per-raw-column broadcast
    MACs on the VPU instead of a matmul.

    Load-bearing numerics (round-4 find): a one-pass bf16 Mosaic dot
    quantizes raw positions to ~2^-9 relative, and the top PE bands
    multiply that by 2^(pos_freq-1) — at the real configs' pos_freq 10/12
    the phase error is O(radians), i.e. the kernel silently computed a
    DIFFERENT position-quantized encoding function. Self-consistent
    (fwd+bwd share x, so training still descended) but 20-48% gradient
    divergence from the true f32 function on chip. `Precision.HIGHEST` on
    the dot fixes the numerics but costs measurable step time (Mosaic's
    6-pass decomposition); the contraction depth is only n_raw=3/6, so
    unrolled broadcast multiply-adds are exact AND stay off the MXU."""
    n_raw = raw.shape[1]
    acc = c
    for d in range(n_raw):
        acc = acc + raw[:, d:d + 1] * e2[d:d + 1, :]
    return acc


def _raw_block(pts, rays_d, use_viewdirs: bool):
    """(R, S, 3) points [+ per-sample ray dirs] -> the thin (R*S, n_raw)
    input block consumed by the inline-PE kernels."""
    R, S, _ = pts.shape
    blocks = [pts.reshape(-1, 3)]
    if use_viewdirs:
        blocks.append(
            jnp.broadcast_to(rays_d[:, None, :], (R, S, 3)).reshape(-1, 3)
        )
    return jnp.concatenate(blocks, axis=-1)


def pe_layout(pos_freq: int, dir_freq: int, use_viewdirs: bool,
              feat_dim: int):
    """Host-side constants for the inline-PE layout.

    Kernel X layout: [pts(3) | dirs(3)? | sin(phases) | feats | pad] where
    phases = raw @ E2 + C covers, in order, sin-pos, cos-pos (π/2 offset),
    sin-dir, cos-dir columns, each grouped (3 dims per frequency).

    Returns (row_perm, E2 (n_raw, n_phase), C (1, n_phase), x_dim) with
    row_perm mapping kernel-layout row → canonical NeRFMLP input row.
    """
    import numpy as np

    n_raw = 6 if use_viewdirs else 3
    P, Dq = pos_freq, (dir_freq if use_viewdirs else 0)
    n_phase = 6 * P + 6 * Dq
    E2 = np.zeros((n_raw, n_phase), np.float32)
    C = np.zeros((1, n_phase), np.float32)
    half = np.float32(np.pi / 2)

    canon_pos = 0  # canonical pos block start
    canon_dir = 3 * (2 * P + 1)  # canonical dir block start
    perm = []
    # raw columns
    perm += [canon_pos + d for d in range(3)]
    if use_viewdirs:
        perm += [canon_dir + d for d in range(3)]
    col = 0
    # sin-pos, cos-pos
    for trig in range(2):  # 0=sin, 1=cos
        for f in range(P):
            for d in range(3):
                E2[d, col] = 2.0 ** f
                C[0, col] = half * trig
                perm.append(canon_pos + 3 + 6 * f + 3 * trig + d)
                col += 1
    if use_viewdirs:
        for trig in range(2):
            for f in range(Dq):
                for d in range(3):
                    E2[3 + d, col] = 2.0 ** f
                    C[0, col] = half * trig
                    perm.append(canon_dir + 3 + 6 * f + 3 * trig + d)
                    col += 1
    # Without viewdirs the canonical input has NO dir block at all — the
    # features start right after PE(pos). (A phantom 3-wide dir offset here
    # pushed the feature rows 3 past the end of w0; jnp.take's fill mode
    # then NaN-filled them, which is how the bug announced itself.)
    canon_feat = canon_dir + (3 * (2 * Dq + 1) if use_viewdirs else 0)
    perm += [canon_feat + k for k in range(feat_dim)]
    x_dim = n_raw + n_phase + feat_dim
    return np.asarray(perm, np.int32), E2, C, x_dim


def _fwd_pe_kernel(
    raw_ref, feats_ref, z_ref, dnorm_ref, e2_ref, c_ref,
    w0_ref, b0_ref, wh_ref, bh_ref, wout_ref, bout_ref,
    rgb_ref, depth_ref, acc_ref, weights_ref,
    *, S, white_bkgd, compute_dtype, use_feats, x_pad,
):
    """Forward render with the positional encoding built in VMEM: the thin
    (N, n_raw) raw block arrives from HBM, the phase matrix is one MXU
    matmul (sin/cos share it via a π/2 offset — see train_kernel.pe_layout),
    and the (N, 128+) encoded block never exists in HBM. Weight rows must be
    pre-permuted with pack_params(row_perm=...)."""
    raw = raw_ref[:]
    phases = _phases_exact(raw, e2_ref[:], c_ref[:])
    blocks = [raw, jnp.sin(phases)]
    d_used = raw.shape[1] + phases.shape[1]
    if use_feats:
        blocks.append(feats_ref[:])
        d_used += feats_ref.shape[1]
    if x_pad > d_used:
        blocks.append(jnp.zeros((raw.shape[0], x_pad - d_used), raw.dtype))
    x = jnp.concatenate(blocks, axis=1)

    R = z_ref.shape[0]
    out, _ = _mlp_forward(
        x, w0_ref[:], b0_ref[:], wh_ref[:], bh_ref[:], wout_ref[:],
        bout_ref[:], compute_dtype=compute_dtype,
    )
    rgb_s = jax.nn.sigmoid(out[:, 0:3]).reshape(R, S, 3)
    sigma = out[:, 3].reshape(R, S)
    z = z_ref[:]
    _, _, _, _, weights = _composite(sigma, z, dnorm_ref[:], white_bkgd)
    rgb_map = jnp.sum(weights[..., None] * rgb_s, axis=1)
    acc = jnp.sum(weights, axis=1, keepdims=True)
    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc)
    rgb_ref[:] = rgb_map
    depth_ref[:] = jnp.sum(weights * z, axis=1, keepdims=True)
    acc_ref[:] = acc
    weights_ref[:] = weights


def _bwd_kernel(
    x_ref, z_ref, dnorm_ref, w0_ref, b0_ref, wh_ref, bh_ref, wout_ref,
    bout_ref, g_rgb_ref, g_depth_ref, g_acc_ref, g_weights_ref,
    dx_ref, dw0_ref, db0_ref, dwh_ref, dbh_ref, dwout_ref, dbout_ref,
    *, S, white_bkgd, compute_dtype,
):
    R = z_ref.shape[0]
    N = R * S

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw0_ref[:] = jnp.zeros_like(dw0_ref)
        db0_ref[:] = jnp.zeros_like(db0_ref)
        dwh_ref[:] = jnp.zeros_like(dwh_ref)
        dbh_ref[:] = jnp.zeros_like(dbh_ref)
        dwout_ref[:] = jnp.zeros_like(dwout_ref)
        dbout_ref[:] = jnp.zeros_like(dbout_ref)

    x = x_ref[:]
    out, acts = _mlp_forward(
        x, w0_ref[:], b0_ref[:], wh_ref[:], bh_ref[:], wout_ref[:],
        bout_ref[:], save_acts=True, compute_dtype=compute_dtype,
    )
    rgb_s = jax.nn.sigmoid(out[:, 0:3]).reshape(R, S, 3)
    sigma = out[:, 3].reshape(R, S)
    z = z_ref[:]
    alpha, om, dists, trans, weights = _composite(
        sigma, z, dnorm_ref[:], white_bkgd
    )

    g_rgb = g_rgb_ref[:]  # (R, 3)
    g_depth = g_depth_ref[:]  # (R, 1)
    g_acc = g_acc_ref[:]  # (R, 1)
    if white_bkgd:
        # rgb_map += (1-acc): d acc -= sum(g_rgb)
        g_acc = g_acc - jnp.sum(g_rgb, axis=1, keepdims=True)

    # d rgb_samples: w_i * g_rgb  → (R, S, 3)
    d_rgb_s = weights[..., None] * g_rgb[:, None, :]
    # dL/dw_i = g_rgb·c_i + g_depth·z_i + g_acc + direct weights cotangent
    dLdw = (
        jnp.sum(rgb_s * g_rgb[:, None, :], axis=2) + g_depth * z + g_acc
        + g_weights_ref[:]
    )  # (R, S)
    # dL/dalpha_k = dLdw_k·T_k − (Σ_{i>k} dLdw_i·w_i) / (1 − alpha_k + eps)
    # HIGHEST: the true suffix sum is a small difference of large signed
    # terms; a single-pass bf16 dot (the Mosaic default) destroys it — see
    # _composite's note.
    s_after = jnp.dot(
        dLdw * weights, _tri_after(S, z.dtype).T,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    d_alpha = dLdw * trans - s_after / om
    # alpha = 1 − exp(−relu(σ)·dist) → dσ = d_alpha·exp(...)·dist·[σ>0]
    exp_term = 1.0 - alpha
    d_sigma = d_alpha * exp_term * dists * (sigma > 0.0).astype(z.dtype)

    # head backward: out4 cols [r,g,b,σ]; sigmoid'(x) = s(1−s)
    d_pre_rgb = (d_rgb_s * rgb_s * (1.0 - rgb_s)).reshape(N, 3)
    g_out = jnp.concatenate(
        [
            d_pre_rgb,
            d_sigma.reshape(N, 1),
            jnp.zeros((N, OUT_PAD - 4), z.dtype),
        ],
        axis=1,
    )

    h_last = acts[-1]
    dwout_ref[:] += _dot(h_last.T, g_out, compute_dtype)
    dbout_ref[:] += jnp.sum(g_out, axis=0, keepdims=True)
    g_h = _dot(g_out, wout_ref[:].T, compute_dtype)

    n_hidden = wh_ref.shape[0]
    for l in range(n_hidden - 1, -1, -1):
        g_h = g_h * (acts[l + 2] > 0.0).astype(z.dtype)
        dwh_ref[l] += _dot(acts[l + 1].T, g_h, compute_dtype)
        dbh_ref[l] += jnp.sum(g_h, axis=0, keepdims=True)[0]
        g_h = _dot(g_h, wh_ref[l].T, compute_dtype)

    g_h = g_h * (acts[1] > 0.0).astype(z.dtype)
    dw0_ref[:] += _dot(acts[0].T, g_h, compute_dtype)
    db0_ref[:] += jnp.sum(g_h, axis=0, keepdims=True)
    dx_ref[:] = _dot(g_h, w0_ref[:].T, compute_dtype)


def _check_shapes(x, z, dnorm, w0, wh, wout):
    N, D = x.shape
    R, S = z.shape
    assert N == R * S, (N, R, S)
    assert D == w0.shape[0] and D % 128 == 0, (D, w0.shape)
    H = w0.shape[1]
    assert H % 128 == 0
    assert wout.shape == (H, OUT_PAD)
    return R, S, H


# Empirically tuned on v5e: raise the scoped-VMEM ceiling above the 16 MiB
# default so larger ray tiles fit (v5e cores have far more physical VMEM).
VMEM_LIMIT = 100 * 1024 * 1024
# Activation-stash budget for the backward/train kernels: sets the ray-tile
# size via R_T ≈ budget / ((L+2)·H·4·S). Sweep at flagship shapes (2048×64,
# 8×256 trunk, v5e): 6MB/R_T=8 → 3.95 ms/step, 12MB/R_T=16 → 3.44 (best),
# 24MB/R_T=32 → 4.04, 48MB/R_T=64 → 3.82.
BWD_STASH_BUDGET = 12 * 1024 * 1024


def _compiler_params():
    return pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT)


def _pick_tile_rays(R: int, cap: int) -> int:
    """Largest ray-tile R_T ≤ cap with R % R_T == 0 that satisfies Mosaic's
    block rule: the sublane dim of an (R_T, S) block must be divisible by 8
    (or equal the full array dim). ``cap`` is a VMEM-budget heuristic, not a
    hard bound — when it falls below 8 the tile is rounded *up* to 8 (the
    scoped-VMEM ceiling is far above the stash budget)."""
    cap = max(min(cap, R), 1)
    if R % 8 == 0:
        rt = max((cap // 8) * 8, 8)
        while R % rt != 0:
            rt -= 8  # terminates: 8 always divides R here
        return rt
    # Odd R (small test shapes): a single full-array block is always legal.
    rt = cap
    while R % rt != 0 or (rt % 8 != 0 and rt != R):
        rt -= 1
        if rt == 0:
            return R
    return rt


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12)
)
def fused_render(
    x, z, dnorm, w0, b0, wh, bh, wout, bout,
    white_bkgd: bool = False, tile_rays: int = 64, interpret: bool = False,
    compute_dtype: str = "float32",
):
    """Fused MLP + alpha-composite render.

    Args:
        x: (R*S, 128) encoded per-point inputs (zero-padded lanes).
        z: (R, S) sample depths; dnorm: (R, 1) ||rays_d||.
        w0/b0: (128, H), (1, H) first trunk layer; wh/bh: (L-1, H, H),
            (L-1, H) remaining trunk; wout/bout: (H, 128), (1, 128) packed
            heads — columns [r, g, b, sigma], rest zero.
        white_bkgd / tile_rays / interpret: static.

    Returns:
        rgb (R, 3), depth (R, 1), acc (R, 1), weights (R, S).
    """
    return _fused_fwd_impl(
        x, z, dnorm, w0, b0, wh, bh, wout, bout, white_bkgd, tile_rays,
        interpret, compute_dtype,
    )


def _fused_fwd_impl(
    x, z, dnorm, w0, b0, wh, bh, wout, bout, white_bkgd, tile_rays, interpret,
    compute_dtype="float32",
):
    R, S, H = _check_shapes(x, z, dnorm, w0, wh, wout)
    R_T = _pick_tile_rays(R, tile_rays)
    n_tiles = R // R_T
    L1 = wh.shape[0]

    D = x.shape[1]
    kernel = functools.partial(_fwd_kernel, S=S, white_bkgd=white_bkgd,
                               compute_dtype=compute_dtype)
    full = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    grid_spec = pl.GridSpec(
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((R_T * S, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R_T, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R_T, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            full((D, H)),
            full((1, H)),
            full((L1, H, H)),
            full((L1, H)),
            full((H, OUT_PAD)),
            full((1, OUT_PAD)),
        ],
        out_specs=[
            pl.BlockSpec((R_T, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R_T, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R_T, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R_T, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
    )
    rgb, depth, acc, weights = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((R, 3), x.dtype),
            jax.ShapeDtypeStruct((R, 1), x.dtype),
            jax.ShapeDtypeStruct((R, 1), x.dtype),
            jax.ShapeDtypeStruct((R, S), x.dtype),
        ],
        grid_spec=grid_spec,
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(x, z, dnorm, w0, b0, wh, bh, wout, bout)
    return rgb, depth, acc, weights


def fused_render_fwd_pe(
    raw, feats, z, dnorm, e2, c, packed, white_bkgd=False, tile_rays=64,
    interpret=False, compute_dtype="float32", use_feats=False,
):
    """Forward-only inline-PE render: (rgb, depth, acc, weights).

    No custom VJP — for no-gradient contexts (eval, the hierarchical coarse
    pass). ``raw`` is the thin (R*S, n_raw) [pts | dirs?] block; ``packed``
    weights must use pack_params(row_perm=pe_layout(...)) so the first
    layer's rows match the in-kernel feature order."""
    w0, b0, wh, bh, wout, bout = packed
    R, S = z.shape
    N, n_raw = raw.shape
    assert N == R * S, (N, R, S)
    H = w0.shape[1]
    D = w0.shape[0]
    L1 = wh.shape[0]
    R_T = _pick_tile_rays(R, tile_rays)
    n_tiles = R // R_T
    n_phase = e2.shape[1]
    Fd = feats.shape[1]

    kernel = functools.partial(
        _fwd_pe_kernel, S=S, white_bkgd=white_bkgd,
        compute_dtype=compute_dtype, use_feats=use_feats, x_pad=D,
    )
    full = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    tile2 = lambda w: pl.BlockSpec(
        (R_T * S, w), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pl.GridSpec(
        grid=(n_tiles,),
        in_specs=[
            tile2(n_raw),
            tile2(Fd),
            pl.BlockSpec((R_T, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R_T, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            full((n_raw, n_phase)),
            full((1, n_phase)),
            full((D, H)),
            full((1, H)),
            full((L1, H, H)),
            full((L1, H)),
            full((H, OUT_PAD)),
            full((1, OUT_PAD)),
        ],
        out_specs=[
            pl.BlockSpec((R_T, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R_T, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R_T, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R_T, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((R, 3), raw.dtype),
            jax.ShapeDtypeStruct((R, 1), raw.dtype),
            jax.ShapeDtypeStruct((R, 1), raw.dtype),
            jax.ShapeDtypeStruct((R, S), raw.dtype),
        ],
        grid_spec=grid_spec,
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(raw, feats, z, dnorm, e2, c, w0, b0, wh, bh, wout, bout)


def _fused_fwd_rule(x, z, dnorm, w0, b0, wh, bh, wout, bout,
                    white_bkgd, tile_rays, interpret, compute_dtype):
    out = _fused_fwd_impl(
        x, z, dnorm, w0, b0, wh, bh, wout, bout, white_bkgd, tile_rays,
        interpret, compute_dtype,
    )
    return out, (x, z, dnorm, w0, b0, wh, bh, wout, bout)


def _fused_bwd_rule(white_bkgd, tile_rays, interpret, compute_dtype, res, g):
    x, z, dnorm, w0, b0, wh, bh, wout, bout = res
    g_rgb, g_depth, g_acc, g_weights = g
    R, S, H = _check_shapes(x, z, dnorm, w0, wh, wout)
    # Backward holds every layer activation in VMEM: (L+2)·R_T·S·H·4 bytes.
    # Budget ~6 MB for the stash (weights + dW accumulators + io take the
    # rest of the 16 MB): R_T·S ≤ 6MB / ((L+2)·H·4).
    L_total = wh.shape[0] + 2
    budget = BWD_STASH_BUDGET
    max_pts = max(budget // (L_total * H * 4), S)
    R_T = _pick_tile_rays(R, min(max_pts // S, tile_rays))
    n_tiles = R // R_T
    L1 = wh.shape[0]

    D = x.shape[1]
    kernel = functools.partial(_bwd_kernel, S=S, white_bkgd=white_bkgd,
                               compute_dtype=compute_dtype)
    full = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    acc_spec = full
    grid_spec = pl.GridSpec(
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((R_T * S, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R_T, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R_T, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            full((D, H)),
            full((1, H)),
            full((L1, H, H)),
            full((L1, H)),
            full((H, OUT_PAD)),
            full((1, OUT_PAD)),
            pl.BlockSpec((R_T, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R_T, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R_T, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R_T, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((R_T * S, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            acc_spec((D, H)),
            acc_spec((1, H)),
            acc_spec((L1, H, H)),
            acc_spec((L1, H)),
            acc_spec((H, OUT_PAD)),
            acc_spec((1, OUT_PAD)),
        ],
    )
    dx, dw0, db0, dwh, dbh, dwout, dbout = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct(w0.shape, x.dtype),
            jax.ShapeDtypeStruct((1, H), x.dtype),
            jax.ShapeDtypeStruct(wh.shape, x.dtype),
            jax.ShapeDtypeStruct(bh.shape, x.dtype),
            jax.ShapeDtypeStruct(wout.shape, x.dtype),
            jax.ShapeDtypeStruct((1, OUT_PAD), x.dtype),
        ],
        grid_spec=grid_spec,
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(x, z, dnorm, w0, b0, wh, bh, wout, bout, g_rgb, g_depth, g_acc,
      g_weights)
    zeros = lambda a: jnp.zeros_like(a)
    return (
        dx, zeros(z), zeros(dnorm), dw0, db0[0] if b0.ndim == 1 else db0,
        dwh, dbh, dwout, dbout[0] if bout.ndim == 1 else dbout,
    )


fused_render.defvjp(_fused_fwd_rule, _fused_bwd_rule)


# --------------------------------------------------------------- param glue


def pack_params(params, num_layers: int, hidden_dim: int,
                lora_alpha: float = 16.0, d_pad: int = D_PAD,
                row_perm=None):
    """Pack a NeRFMLP param tree (models.mlp.NeRFMLP layout) into the
    kernel's padded weight tensors. Traceable (pure jnp) so it runs inside
    the jitted train step — XLA folds the padding/merging into the step.

    LoRA trunk layers are merged into effective kernels
    ``W + (alpha/rank)·A@B``; gradients flow back to A/B through this merge
    automatically under autodiff.

    ``row_perm`` (optional int array) reorders the first layer's input rows
    before padding — used by the inline-PE train kernel, whose in-VMEM
    feature layout differs from the canonical NeRFMLP input order."""

    def kb(p):
        return p["kernel"], p["bias"]

    def trunk_layer(i):
        layer = params[f"trunk_{i}"]
        if "base" in layer:  # LoRADense
            k, b = kb(layer["base"])
            a, bb = layer["lora_a"], layer["lora_b"]
            k = k + (lora_alpha / a.shape[1]) * (a @ bb)
            return k, b
        return kb(layer)

    k0, bias0 = trunk_layer(0)
    if row_perm is not None:
        k0 = jnp.take(k0, jnp.asarray(row_perm), axis=0)
    w0 = jnp.zeros((d_pad, hidden_dim), k0.dtype)
    w0 = jax.lax.dynamic_update_slice(w0, k0, (0, 0))
    b0 = bias0[None]

    whs, bhs = [], []
    for i in range(1, num_layers):
        k, b = trunk_layer(i)
        if k.shape != (hidden_dim, hidden_dim):
            # A skip-connection trunk (models.mlp skip_layers) widens the
            # layer input; packing it would silently mis-shape the kernel.
            # The trainer already rejects such configs (_kernel_ineligible_
            # reason) — this guards direct callers.
            raise ValueError(
                f"pack_params requires a uniform {hidden_dim}x{hidden_dim} "
                f"trunk; trunk_{i} kernel has shape {k.shape} (skip "
                "connections are not supported by the fused kernels)"
            )
        whs.append(k)
        bhs.append(b)
    wh = (
        jnp.stack(whs)
        if whs
        else jnp.zeros((0, hidden_dim, hidden_dim), k0.dtype)
    )
    bh = jnp.stack(bhs) if bhs else jnp.zeros((0, hidden_dim), k0.dtype)

    k_rgb, b_rgb = kb(params["rgb_head"])
    k_sig, b_sig = kb(params["sigma_head"])
    wout = jnp.concatenate(
        [k_rgb, k_sig, jnp.zeros((hidden_dim, OUT_PAD - 4), k0.dtype)], axis=1
    )
    bout = jnp.concatenate(
        [b_rgb, b_sig, jnp.zeros((OUT_PAD - 4,), k0.dtype)]
    )[None]
    return w0, b0, wh, bh, wout, bout
