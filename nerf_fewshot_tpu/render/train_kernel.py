"""Single-pass fused training objective: render + masked-MSE loss + all
parameter gradients in one Pallas kernel invocation.

The generic ``fused_render`` + autodiff path runs the MLP forward twice per
step (once in the forward kernel to produce the loss, once recomputed inside
the backward kernel). Specializing to the training objective — the strict
reference loss is rgb MSE only (reference: train.py:36-44) — the loss
cotangent ``g_rgb = 2·(rgb−target)·mask / (3·Σmask)`` is computable inside
the backward kernel itself, eliminating the standalone forward pass
entirely: one kernel does forward → loss partial → analytic backward → dW
accumulation per ray tile.

Gradients flow back to the *unpacked* NeRFMLP parameter tree (including
LoRA factors) via ``jax.vjp`` over the traceable ``pack_params``.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerf_fewshot_tpu.ops.sampling import hierarchical_sample, sample_along_rays
from nerf_fewshot_tpu.render.fused import encode_points
from nerf_fewshot_tpu.render import kernels as _kernels
from nerf_fewshot_tpu.render.kernels import (
    OUT_PAD,
    _check_shapes,
    _compiler_params,
    _composite,
    _dot,
    _fused_fwd_impl,
    _mlp_forward,
    _pick_tile_rays,
    _phases_exact,
    _tri_after,
    _raw_block,
    fused_render_fwd_pe,
    pack_params,
    pe_layout,
)
from nerf_fewshot_tpu.render.pipeline import RenderSettings

# Default sub-chain interleave for the train kernels: number of independent
# ray groups whose trunk chains are walked layer-by-layer inside one grid
# step, letting the MXU overlap consecutive dependent matmuls' fill/drain.
# Sweepable via fused_train_loss_grad(interleave=...) / benchmarks.
TRAIN_INTERLEAVE = 1

# Head compute placement. The rgb+sigma head is 4 real outputs padded to the
# MXU's 128-lane minimum, so its three matmuls (fwd out, bwd g_h, bwd dW) are
# ~97% zero work — together ~6% of the step's MXU passes (RESULTS.md wall
# analysis). 'vpu' computes them as broadcast-multiply(-reduce)s on the VPU
# instead: 4 lane-reduces (fwd), 4 MAC chains (bwd g_h), 4 sublane-reduces
# (bwd dW) over the (N, H) activations — work that can overlap the trunk's
# MXU matmuls. 'mxu' is the padded-matmul layout. Sweepable via
# fused_train_loss_grad(head_mode=...) / bench.py --head-mode.
TRAIN_HEAD_MODE = "mxu"


def _objective_body(
    x, z_ref, dnorm_ref, tgt_ref, mask_ref, invd_ref,
    w0_ref, b0_ref, wh_ref, bh_ref, wout_ref, bout_ref,
    loss_ref, dw0_ref, db0_ref, dwh_ref, dbh_ref, dwout_ref, dbout_ref,
    *, S, white_bkgd, compute_dtype, interleave=1, head_mode="mxu",
    dw_precision=None, reg_weight=0.0, tgtd_ref=None, depth_weight=0.0,
):
    """Shared kernel body: forward → loss partial → analytic backward → dW
    accumulation, for an already-encoded tile input ``x``.

    ``reg_weight`` / ``depth_weight`` + ``tgtd_ref``: the reference
    NeRFLoss's second and third terms (nerf_mlp.py:240-248) computed
    in-pass — ``depth_weight·masked_mean(|Σw·z − tgtd|)`` and
    ``reg_weight·masked_mean(w²)`` with training/losses._masked_mean
    denominators (global under DP via inv_denom), so the kernel covers the
    COMPLETE loss. Both default off (strict reference behavior's rgb-only
    objective compiles to the identical kernel); depth additionally needs
    the per-ray target operand (no reference pipeline supplies depth
    targets, train.py:282-283 — the term exists for API completeness and
    depth-supervised extensions).

    ``dw_precision``: optional ``jax.lax.Precision`` pin for the six dW
    accumulation dots (activationsᵀ @ deltas). Mosaic truncates f32 dot
    inputs to one bf16 pass by default (the round-3/4 bug class); the
    forward trunk shares that behavior with XLA's own DEFAULT so it is not
    a divergence source, but the dW accumulations have no XLA twin at the
    same shapes — HIGHEST here is the diagnostic/conservative option for
    the spike-state residual gap (VERDICT r4 item 4a; measured on-chip:
    see RESULTS.md round-5).

    ``interleave``: split the tile's rays into this many INDEPENDENT
    sub-chains and walk the trunk layer-by-layer across all of them. The
    per-tile residual at flagship shapes is dependent-matmul latency (each
    layer's matmul waits on the previous one's drain); interleaved chains
    give the MXU a second in-flight matmul to overlap fill/drain bubbles
    with. Numerics are identical (same per-row math, same accumulation
    order into the dW refs).

    ``head_mode``: 'mxu' uses the packed (H, OUT_PAD) head matmuls (4 real
    columns of 128); 'vpu' takes the head in row layout wout_ref (8, H) /
    bout_ref (1, 8) and computes all three head contractions as VPU
    broadcast-multiply-reduces over (N, H), off the MXU entirely (and in
    exact f32 — the VPU does not truncate)."""
    R = z_ref.shape[0]
    N = R * S

    @pl.when(pl.program_id(0) == 0)
    def _init():
        loss_ref[:] = jnp.zeros_like(loss_ref)
        dw0_ref[:] = jnp.zeros_like(dw0_ref)
        db0_ref[:] = jnp.zeros_like(db0_ref)
        dwh_ref[:] = jnp.zeros_like(dwh_ref)
        dbh_ref[:] = jnp.zeros_like(dbh_ref)
        dwout_ref[:] = jnp.zeros_like(dwout_ref)
        dbout_ref[:] = jnp.zeros_like(dbout_ref)

    K = interleave if R % interleave == 0 else 1
    Rc, Nc = R // K, N // K
    vpu_head = head_mode == "vpu"

    def _dot_dw(a, b):
        if dw_precision is not None:
            return jnp.dot(a, b, precision=dw_precision,
                           preferred_element_type=jnp.float32)
        return _dot(a, b, compute_dtype)

    # ---- forward: layer-interleaved across the K independent sub-chains.
    # K=1 must avoid every slice op (x[0:N] etc. can lower to layout
    # copies in Mosaic — a measured ~13% regression on v5e).
    xs = [x] if K == 1 else [x[k * Nc:(k + 1) * Nc] for k in range(K)]
    acts = [[xc] for xc in xs]
    hs = [
        jnp.maximum(_dot(xc, w0_ref[:], compute_dtype) + b0_ref[:], 0.0)
        for xc in xs
    ]
    n_hidden = wh_ref.shape[0]
    for l in range(n_hidden):
        for k in range(K):
            acts[k].append(hs[k])
        hs = [
            jnp.maximum(_dot(h, wh_ref[l], compute_dtype) + bh_ref[l], 0.0)
            for h in hs
        ]
    for k in range(K):
        acts[k].append(hs[k])
    if vpu_head:
        # 4 lane-reduces per chain: out_j = Σ_c h·w_j + b_j. Exact f32.
        w_rows = [wout_ref[j:j + 1, :] for j in range(4)]
        outs = [
            jnp.concatenate(
                [jnp.sum(h * w_rows[j], axis=1, keepdims=True)
                 for j in range(4)],
                axis=1,
            ) + bout_ref[0:1, 0:4]
            for h in hs
        ]
    else:
        outs = [_dot(h, wout_ref[:], compute_dtype) + bout_ref[:] for h in hs]

    # ---- composite + loss + head cotangent per sub-chain (VPU work)
    z = z_ref[:]
    dnorm = dnorm_ref[:]
    tgt = tgt_ref[:]
    mask_all = mask_ref[:]  # (R, 1)
    tgtd_all = tgtd_ref[:] if tgtd_ref is not None else None  # (R, 1)
    inv_denom = invd_ref[0, 0]
    loss_acc = jnp.zeros((1, 1), z.dtype)
    g_outs = []
    for k in range(K):
        rows = slice(k * Rc, (k + 1) * Rc)
        out = outs[k]
        rgb_s = jax.nn.sigmoid(out[:, 0:3]).reshape(Rc, S, 3)
        sigma = out[:, 3].reshape(Rc, S)
        zk = z if K == 1 else z[rows]
        alpha, om, dists, trans, weights = _composite(
            sigma, zk, dnorm if K == 1 else dnorm[rows], white_bkgd
        )
        rgb_map = jnp.sum(weights[..., None] * rgb_s, axis=1)  # (Rc, 3)
        if white_bkgd:
            acc = jnp.sum(weights, axis=1, keepdims=True)
            rgb_map = rgb_map + (1.0 - acc)

        # Masked-MSE loss partial and its rgb cotangent.
        mask = mask_all if K == 1 else mask_all[rows]
        err = (rgb_map - (tgt if K == 1 else tgt[rows])) * mask
        loss_acc += (jnp.sum(err * err) * inv_denom).reshape(1, 1)
        g_rgb = 2.0 * err * inv_denom  # (Rc, 3)

        g_acc_scalar = jnp.zeros((Rc, 1), z.dtype)
        if white_bkgd:
            g_acc_scalar = -jnp.sum(g_rgb, axis=1, keepdims=True)

        d_rgb_s = weights[..., None] * g_rgb[:, None, :]
        dLdw = jnp.sum(rgb_s * g_rgb[:, None, :], axis=2) + g_acc_scalar
        if reg_weight:
            # reg = r·Σ(mask·w²)/(denom_rays·S): inv_denom = 1/(3·denom),
            # so the per-element scale is 3·r/S · inv_denom; seed
            # dL/dw_s += 2·r·mask·w_s/(denom·S). Reduce lane-axis first to
            # (Rc, 1), then the thin sum — Mosaic rejects the fused 2D
            # multi_reduction's offset layout on real hardware (interpret
            # mode is blind to the restriction).
            reg_scale = (3.0 * reg_weight / S) * inv_denom
            wsq = jnp.sum(weights * weights, axis=1, keepdims=True)  # (Rc,1)
            loss_acc += (jnp.sum(wsq * mask) * reg_scale).reshape(1, 1)
            dLdw = dLdw + (2.0 * reg_scale) * mask * weights
        if tgtd_ref is not None:
            # depth L1 (reference NeRFLoss second term, nerf_mlp.py:240-242):
            # depth_r = Σ w_s·z_s; loss += d·Σ mask·|depth − tgtd| / denom;
            # masked-mean denom over (R,) is Σmask, so the scale is
            # 3·d·inv_denom. Seed: dL/dw_s += 3·d·inv_denom·mask·sign·z_s.
            tgtd = tgtd_all if K == 1 else tgtd_all[rows]
            depth_map = jnp.sum(weights * zk, axis=1, keepdims=True)  # (Rc,1)
            diff = depth_map - tgtd
            d_scale = 3.0 * depth_weight * inv_denom
            loss_acc += (jnp.sum(jnp.abs(diff) * mask) * d_scale).reshape(
                1, 1)
            dLdw = dLdw + (d_scale * jnp.sign(diff) * mask) * zk
        # HIGHEST: suffix sums of signed, cancelling terms — a single-pass
        # bf16 dot (the Mosaic default) corrupts small true gradients (see
        # kernels._composite's note; sigma-head grads measured 155× off).
        s_after = jnp.dot(
            dLdw * weights, _tri_after(S, z.dtype).T,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        d_alpha = dLdw * trans - s_after / om
        d_sigma = (
            d_alpha * (1.0 - alpha) * dists * (sigma > 0.0).astype(z.dtype)
        )

        d_pre_rgb = (d_rgb_s * rgb_s * (1.0 - rgb_s)).reshape(Nc, 3)
        if vpu_head:
            # keep the thin (Nc, 4) cotangent; no 128-lane zero pad exists
            g_outs.append(jnp.concatenate(
                [d_pre_rgb, d_sigma.reshape(Nc, 1)], axis=1
            ))
        else:
            g_outs.append(jnp.concatenate(
                [d_pre_rgb, d_sigma.reshape(Nc, 1),
                 jnp.zeros((Nc, OUT_PAD - 4), z.dtype)],
                axis=1,
            ))

    # (1,1) block store — Mosaic disallows scalar stores to VMEM
    loss_ref[:] += loss_acc

    # ---- backward: layer-interleaved g_h chains; dW sums over sub-chains
    if vpu_head:
        # dW rows via sublane reduces; g_h via 4 broadcast MACs. All VPU.
        def head_dw(k):
            h = acts[k][-1]
            g = g_outs[k]
            rows4 = jnp.concatenate(
                [jnp.sum(h * g[:, j:j + 1], axis=0, keepdims=True)
                 for j in range(4)],
                axis=0,
            )  # (4, H)
            return jnp.concatenate(
                [rows4, jnp.zeros((4, h.shape[1]), h.dtype)], axis=0
            )

        def head_db(k):
            return jnp.concatenate(
                [jnp.sum(g_outs[k], axis=0, keepdims=True),
                 jnp.zeros((1, 4), z.dtype)],
                axis=1,
            )

        dwout_acc = head_dw(0)
        dbout_acc = head_db(0)
        for k in range(1, K):
            dwout_acc += head_dw(k)
            dbout_acc += head_db(k)
        dwout_ref[:] += dwout_acc
        dbout_ref[:] += dbout_acc
        g_hs = [
            sum(g[:, j:j + 1] * wout_ref[j:j + 1, :] for j in range(4))
            for g in g_outs
        ]
    else:
        dwout_acc = _dot_dw(acts[0][-1].T, g_outs[0])
        dbout_acc = jnp.sum(g_outs[0], axis=0, keepdims=True)
        for k in range(1, K):
            dwout_acc += _dot_dw(acts[k][-1].T, g_outs[k])
            dbout_acc += jnp.sum(g_outs[k], axis=0, keepdims=True)
        dwout_ref[:] += dwout_acc
        dbout_ref[:] += dbout_acc
        g_hs = [_dot(g, wout_ref[:].T, compute_dtype) for g in g_outs]

    for l in range(n_hidden - 1, -1, -1):
        g_hs = [
            g * (acts[k][l + 2] > 0.0).astype(z.dtype)
            for k, g in enumerate(g_hs)
        ]
        dwh_acc = _dot_dw(acts[0][l + 1].T, g_hs[0])
        dbh_acc = jnp.sum(g_hs[0], axis=0, keepdims=True)
        for k in range(1, K):
            dwh_acc += _dot_dw(acts[k][l + 1].T, g_hs[k])
            dbh_acc += jnp.sum(g_hs[k], axis=0, keepdims=True)
        dwh_ref[l] += dwh_acc
        dbh_ref[l] += dbh_acc[0]
        g_hs = [_dot(g, wh_ref[l].T, compute_dtype) for g in g_hs]

    g_hs = [
        g * (acts[k][1] > 0.0).astype(z.dtype) for k, g in enumerate(g_hs)
    ]
    dw0_acc = _dot_dw(acts[0][0].T, g_hs[0])
    db0_acc = jnp.sum(g_hs[0], axis=0, keepdims=True)
    for k in range(1, K):
        dw0_acc += _dot_dw(acts[k][0].T, g_hs[k])
        db0_acc += jnp.sum(g_hs[k], axis=0, keepdims=True)
    dw0_ref[:] += dw0_acc
    db0_ref[:] += db0_acc


def _train_kernel(
    x_ref, z_ref, dnorm_ref, tgt_ref, mask_ref, invd_ref,
    w0_ref, b0_ref, wh_ref, bh_ref, wout_ref, bout_ref,
    *rest,
    S, white_bkgd, compute_dtype, interleave=1, head_mode="mxu",
    dw_precision=None, reg_weight=0.0, depth_weight=0.0, use_depth=False,
):
    # optional depth-target operand precedes the outputs (static use_depth)
    tgtd_ref = rest[0] if use_depth else None
    outs = rest[1:] if use_depth else rest
    (loss_ref, dw0_ref, db0_ref, dwh_ref, dbh_ref, dwout_ref,
     dbout_ref) = outs
    _objective_body(
        x_ref[:], z_ref, dnorm_ref, tgt_ref, mask_ref, invd_ref,
        w0_ref, b0_ref, wh_ref, bh_ref, wout_ref, bout_ref,
        loss_ref, dw0_ref, db0_ref, dwh_ref, dbh_ref, dwout_ref, dbout_ref,
        S=S, white_bkgd=white_bkgd, compute_dtype=compute_dtype,
        interleave=interleave, head_mode=head_mode,
        dw_precision=dw_precision, reg_weight=reg_weight,
        tgtd_ref=tgtd_ref, depth_weight=depth_weight,
    )


def _train_pe_kernel(
    raw_ref, feats_ref, z_ref, dnorm_ref, tgt_ref, mask_ref, invd_ref,
    e2_ref, c_ref,
    w0_ref, b0_ref, wh_ref, bh_ref, wout_ref, bout_ref,
    *rest,
    S, white_bkgd, compute_dtype, use_feats, x_pad, interleave=1,
    head_mode="mxu", dw_precision=None, reg_weight=0.0, depth_weight=0.0,
    use_depth=False,
):
    tgtd_ref = rest[0] if use_depth else None
    (loss_ref, dw0_ref, db0_ref, dwh_ref, dbh_ref, dwout_ref,
     dbout_ref) = rest[1:] if use_depth else rest
    """Inline-PE variant: raw per-point inputs (pts[, dirs]) arrive as a thin
    (N, n_raw) block and the positional encoding is built in VMEM — the
    phase matrix is one MXU matmul (sin and cos columns share it via a π/2
    phase offset), so the (N, 128+) encoded block never exists in HBM. The
    first trunk layer's rows are pre-permuted to this layout (pack_params
    row_perm)."""
    raw = raw_ref[:]  # (N, n_raw): [pts | dirs?]
    # exact-f32 phases via VPU broadcast MACs — one-pass bf16 here garbles
    # the top PE bands at pos_freq 10/12 (round-4 20-48% on-chip gradient
    # divergence) and HIGHEST costs step time; see kernels._phases_exact.
    phases = _phases_exact(raw, e2_ref[:], c_ref[:])
    blocks = [raw, jnp.sin(phases)]
    d_used = raw.shape[1] + phases.shape[1]
    if use_feats:
        blocks.append(feats_ref[:])
        d_used += feats_ref.shape[1]
    if x_pad > d_used:
        blocks.append(jnp.zeros((raw.shape[0], x_pad - d_used), raw.dtype))
    x = jnp.concatenate(blocks, axis=1)
    _objective_body(
        x, z_ref, dnorm_ref, tgt_ref, mask_ref, invd_ref,
        w0_ref, b0_ref, wh_ref, bh_ref, wout_ref, bout_ref,
        loss_ref, dw0_ref, db0_ref, dwh_ref, dbh_ref, dwout_ref, dbout_ref,
        S=S, white_bkgd=white_bkgd, compute_dtype=compute_dtype,
        interleave=interleave, head_mode=head_mode,
        dw_precision=dw_precision, reg_weight=reg_weight,
        tgtd_ref=tgtd_ref, depth_weight=depth_weight,
    )


def _head_shapes(H, head_mode):
    """(wout, bout) shapes for the given head layout."""
    if head_mode == "vpu":
        return (8, H), (1, 8)
    return (H, OUT_PAD), (1, OUT_PAD)


def _to_vpu_head(wout, bout):
    """(H, OUT_PAD) packed head → row layout (8, H) / (1, 8): rows
    [r, g, b, sigma, 0×4]. Traceable XLA ops outside the kernel, so head
    gradients flow back through the same transform."""
    H = wout.shape[0]
    wout_t = jnp.concatenate(
        [wout[:, :4].T, jnp.zeros((4, H), wout.dtype)], axis=0
    )
    bout_t = jnp.concatenate(
        [bout[:, :4], jnp.zeros((1, 4), bout.dtype)], axis=1
    )
    return wout_t, bout_t


def _train_pe_call(raw, feats, z, dnorm, tgt, mask, inv_denom, e2, c,
                   packed, white_bkgd, interpret, compute_dtype, use_feats,
                   interleave=1, head_mode="mxu", dw_precision=None,
                   reg_weight=0.0, depth_weight=0.0, tgt_depth=None):
    w0, b0, wh, bh, wout, bout = packed
    R, S = z.shape
    N, n_raw = raw.shape
    assert N == R * S
    H = w0.shape[1]
    D = w0.shape[0]  # padded x width
    L1 = wh.shape[0]
    # Per-CHAIN stash budget: an interleaved tile holds K chains' activations
    # so the tile grows K× while each dependent-matmul chain keeps the
    # latency-optimal per-chain size.
    max_pts = max(
        interleave * _kernels.BWD_STASH_BUDGET // ((L1 + 2) * H * 4), S
    )
    R_T = _pick_tile_rays(R, max_pts // S)
    # Each sub-chain must keep ≥8 rays (Mosaic's sublane minimum for the
    # (Rc, S) compositing ops) and divide the tile evenly.
    while interleave > 1 and (
        R_T % interleave != 0 or R_T // interleave < 8
    ):
        interleave //= 2
    n_tiles = R // R_T
    n_phase = e2.shape[1]
    Fd = feats.shape[1]

    use_depth = tgt_depth is not None
    kernel = functools.partial(
        _train_pe_kernel, S=S, white_bkgd=white_bkgd,
        compute_dtype=compute_dtype, use_feats=use_feats, x_pad=D,
        interleave=interleave, head_mode=head_mode,
        dw_precision=dw_precision, reg_weight=reg_weight,
        depth_weight=depth_weight, use_depth=use_depth,
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
            pl.BlockSpec((R_T, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R_T, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
            full((n_raw, n_phase)),
            full((1, n_phase)),
            full((D, H)),
            full((1, H)),
            full((L1, H, H)),
            full((L1, H)),
            full(wout.shape),
            full(bout.shape),
        ] + ([pl.BlockSpec((R_T, 1), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)] if use_depth else []),
        out_specs=[
            full((1, 1)),
            full((D, H)),
            full((1, H)),
            full((L1, H, H)),
            full((L1, H)),
            full(wout.shape),
            full(bout.shape),
        ],
    )
    operands = (raw, feats, z, dnorm, tgt, mask, inv_denom, e2, c,
                w0, b0, wh, bh, wout, bout)
    if use_depth:
        operands = operands + (tgt_depth,)
    loss, dw0, db0, dwh, dbh, dwout, dbout = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((1, 1), raw.dtype),
            jax.ShapeDtypeStruct(w0.shape, raw.dtype),
            jax.ShapeDtypeStruct((1, H), raw.dtype),
            jax.ShapeDtypeStruct(wh.shape, raw.dtype),
            jax.ShapeDtypeStruct(bh.shape, raw.dtype),
            jax.ShapeDtypeStruct(wout.shape, raw.dtype),
            jax.ShapeDtypeStruct(bout.shape, raw.dtype),
        ],
        grid_spec=grid_spec,
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(*operands)
    return loss[0, 0], (dw0, db0, dwh, dbh, dwout, dbout)


def _train_call(x, z, dnorm, tgt, mask, inv_denom, packed, white_bkgd,
                interpret, compute_dtype, interleave=1, head_mode="mxu",
                dw_precision=None, reg_weight=0.0, depth_weight=0.0,
                tgt_depth=None):
    w0, b0, wh, bh, wout, bout = packed
    R, S = z.shape
    H = w0.shape[1]
    # Full pack validation (ADVICE r4): a mismatched pack must fail with a
    # clear assert here, not an opaque Mosaic/pallas lowering error.
    assert x.shape == (R * S, w0.shape[0]), (x.shape, R, S, w0.shape)
    assert x.shape[1] % 128 == 0 and H % 128 == 0, (x.shape, H)
    assert dnorm.shape == (R, 1), dnorm.shape
    assert wh.shape[1:] == (H, H) and bh.shape[1:] == (H,), (
        wh.shape, bh.shape)
    assert wout.shape == (_head_shapes(H, head_mode)[0])
    D = x.shape[1]
    L1 = wh.shape[0]
    L_total = L1 + 2
    max_pts = max(
        interleave * _kernels.BWD_STASH_BUDGET // (L_total * H * 4), S
    )
    R_T = _pick_tile_rays(R, max_pts // S)
    while interleave > 1 and (
        R_T % interleave != 0 or R_T // interleave < 8
    ):
        interleave //= 2
    n_tiles = R // R_T

    use_depth = tgt_depth is not None
    kernel = functools.partial(
        _train_kernel, S=S, white_bkgd=white_bkgd,
        compute_dtype=compute_dtype, interleave=interleave,
        head_mode=head_mode, dw_precision=dw_precision,
        reg_weight=reg_weight, depth_weight=depth_weight,
        use_depth=use_depth,
    )
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
            pl.BlockSpec((R_T, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R_T, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
            full((D, H)),
            full((1, H)),
            full((L1, H, H)),
            full((L1, H)),
            full(wout.shape),
            full(bout.shape),
        ] + ([pl.BlockSpec((R_T, 1), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)] if use_depth else []),
        out_specs=[
            full((1, 1)),
            full((D, H)),
            full((1, H)),
            full((L1, H, H)),
            full((L1, H)),
            full(wout.shape),
            full(bout.shape),
        ],
    )
    operands = (x, z, dnorm, tgt, mask, inv_denom, w0, b0, wh, bh, wout,
                bout)
    if use_depth:
        operands = operands + (tgt_depth,)
    loss, dw0, db0, dwh, dbh, dwout, dbout = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((1, 1), x.dtype),
            jax.ShapeDtypeStruct(w0.shape, x.dtype),
            jax.ShapeDtypeStruct((1, H), x.dtype),
            jax.ShapeDtypeStruct(wh.shape, x.dtype),
            jax.ShapeDtypeStruct(bh.shape, x.dtype),
            jax.ShapeDtypeStruct(wout.shape, x.dtype),
            jax.ShapeDtypeStruct(bout.shape, x.dtype),
        ],
        grid_spec=grid_spec,
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(*operands)
    return loss[0, 0], (dw0, db0, dwh, dbh, dwout, dbout)


def fused_train_loss_grad(
    params,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    target: jnp.ndarray,
    mask: jnp.ndarray,  # (R,) validity
    settings: RenderSettings,
    pos_freq: int,
    dir_freq: int,
    num_layers: int,
    hidden_dim: int,
    use_viewdirs: bool = True,
    lora_alpha: float = 16.0,
    key: Optional[jax.Array] = None,
    point_features_fn=None,
    interpret: bool = False,
    compute_dtype: str = "float32",
    denom_rays: Optional[jnp.ndarray] = None,
    inline_pe: bool = True,
    interleave: Optional[int] = None,
    head_mode: Optional[str] = None,
    dw_precision=None,
    reg_weight: float = 0.0,
    depth_weight: float = 0.0,
    target_depth: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, dict]:
    """(masked-MSE loss, param-gradient tree) in one fused kernel pass.

    Matches ``mean((rgb - target)^2)`` over valid rays exactly (the strict
    reference objective); gradients equal the autodiff path (pinned by
    tests/test_train_kernel.py).

    ``denom_rays`` overrides the normalizer (defaults to the local Σmask) —
    under data parallelism pass the *global* valid-ray count so per-shard
    losses/grads psum to the exact global masked mean.

    Hierarchical coarse+fine (``settings.n_importance > 0``) runs as two
    kernel dispatches: a forward-only coarse pass (its weights feed the
    inverse-CDF sampler under stop-gradient — standard NeRF semantics,
    pipeline.render_rays:131) and this single-pass objective kernel over the
    merged coarse+fine sample set. Versus autodiff through the fused
    renderer this saves the standalone fine forward entirely.
    """
    assert settings.noise_std == 0.0
    if isinstance(dw_precision, str):
        dw_precision = jax.lax.Precision(dw_precision)
    # depth L1 term (reference NeRFLoss, nerf_mlp.py:240-242): active only
    # when BOTH a weight and per-ray target depths are given
    tgt_depth = None
    if depth_weight > 0.0 and target_depth is not None:
        tgt_depth = target_depth.reshape(-1, 1)
    else:
        depth_weight = 0.0
    if interleave is None:
        interleave = TRAIN_INTERLEAVE
    if head_mode is None:
        head_mode = TRAIN_HEAD_MODE

    def _pack(p, d_pad, row_perm=None):
        out = pack_params(p, num_layers, hidden_dim, lora_alpha,
                          d_pad=d_pad, row_perm=row_perm)
        if head_mode == "vpu":
            w0, b0, wh, bh, wout, bout = out
            wout, bout = _to_vpu_head(wout, bout)
            out = (w0, b0, wh, bh, wout, bout)
        return out

    k_strat = k_imp = None
    if key is not None and settings.perturb:
        k_strat, k_imp = jax.random.split(key)

    dnorm = jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    pts, z = sample_along_rays(
        rays_o, rays_d, settings.near, settings.far, settings.n_samples,
        key=k_strat, lindisp=settings.lindisp,
    )

    if settings.n_importance > 0:
        # Coarse pass: no gradients are needed (the sampling distribution is
        # stop-gradient), so call a forward-only kernel — no VJP residuals.
        dino_c = None
        if point_features_fn is not None:
            dino_c = point_features_fn(pts.reshape(-1, 3))
        frozen = jax.lax.stop_gradient(params)
        if inline_pe:
            feat_dim = 0 if dino_c is None else dino_c.shape[-1]
            perm, e2, c, x_dim = pe_layout(
                pos_freq, dir_freq, use_viewdirs, feat_dim
            )
            packed_c = pack_params(
                frozen, num_layers, hidden_dim, lora_alpha,
                d_pad=-(-x_dim // 128) * 128, row_perm=perm,
            )
            raw_c = _raw_block(pts, rays_d, use_viewdirs)
            feats_c = dino_c if dino_c is not None else jnp.zeros(
                (raw_c.shape[0], 8), raw_c.dtype
            )
            _, _, _, weights_c = fused_render_fwd_pe(
                raw_c, feats_c, z, dnorm, jnp.asarray(e2), jnp.asarray(c),
                packed_c, settings.white_bkgd, interpret=interpret,
                compute_dtype=compute_dtype, use_feats=dino_c is not None,
            )
        else:
            x_c = encode_points(
                pts, rays_d, pos_freq, dir_freq, use_viewdirs, dino_c
            )
            packed_c = pack_params(
                frozen, num_layers, hidden_dim, lora_alpha,
                d_pad=x_c.shape[-1],
            )
            _, _, _, weights_c = _fused_fwd_impl(
                x_c, z, dnorm, *packed_c, settings.white_bkgd, 64, interpret,
                compute_dtype,
            )
        pts, z = hierarchical_sample(
            rays_o, rays_d, z, weights_c, settings.n_importance, key=k_imp
        )

    dino = None
    if point_features_fn is not None:
        dino = point_features_fn(pts.reshape(-1, 3))
    if denom_rays is None:
        denom_rays = jnp.sum(mask)
    inv_denom = (1.0 / (3.0 * jnp.maximum(denom_rays, 1.0))).reshape(1, 1)

    if inline_pe:
        feat_dim = 0 if dino is None else dino.shape[-1]
        perm, e2, c, x_dim = pe_layout(
            pos_freq, dir_freq, use_viewdirs, feat_dim
        )
        d_pad = -(-x_dim // 128) * 128
        packed, pack_vjp = jax.vjp(
            lambda p: _pack(p, d_pad, row_perm=perm), params
        )
        raw = _raw_block(pts, rays_d, use_viewdirs)
        feats = dino if dino is not None else jnp.zeros((raw.shape[0], 8),
                                                        raw.dtype)
        loss, dpacked = _train_pe_call(
            raw, feats, z, dnorm, target, mask[:, None], inv_denom,
            jnp.asarray(e2), jnp.asarray(c), packed, settings.white_bkgd,
            interpret, compute_dtype, use_feats=dino is not None,
            interleave=interleave, head_mode=head_mode,
            dw_precision=dw_precision, reg_weight=reg_weight,
            depth_weight=depth_weight, tgt_depth=tgt_depth,
        )
        grads = pack_vjp(dpacked)[0]
        return loss, grads

    x = encode_points(pts, rays_d, pos_freq, dir_freq, use_viewdirs, dino)
    d_pad = x.shape[-1]
    packed, pack_vjp = jax.vjp(lambda p: _pack(p, d_pad), params)
    loss, dpacked = _train_call(
        x, z, dnorm, target, mask[:, None], inv_denom, packed,
        settings.white_bkgd, interpret, compute_dtype, interleave=interleave,
        head_mode=head_mode, dw_precision=dw_precision,
        reg_weight=reg_weight, depth_weight=depth_weight,
        tgt_depth=tgt_depth,
    )
    grads = pack_vjp(dpacked)[0]
    return loss, grads
