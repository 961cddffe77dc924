"""The training engine.

Re-implements the reference's config-driven trainer loop
(reference: src/training/train.py:46-389) TPU-first:

* The hot path is one jit-compiled ``train_step`` (forward render + loss +
  backward + optax update) per progressive-resolution phase — exactly three
  compiled shapes for the reference's schedule (train.py:249-258), instead of
  eager per-op dispatch.
* Ray batches are *static-shape*: partial batches are padded and masked, so
  gradients equal the reference's ragged batches bit-for-bit while XLA
  compiles once.
* All randomness is explicit (jax.random keys threaded per step); per-epoch
  ray permutations use a host numpy RNG (reference: train.py:272 randperm).
* Per-view progressive rays are precomputed per phase (focal scaled by
  H_phase/H, targets bilinear-resized — train.py:266-270) and kept on device.
* DINO conditioning consumes precomputed per-view feature maps (the reference
  also precomputes once under no_grad — train.py:158-169 — which means its
  DINO-LoRA params receive no gradient in the config path; behavior
  reproduced here by treating feature maps as constants).
* Optional multi-device data parallelism: the ray batch is sharded over a
  1-D device mesh, parameters replicated, gradient psum inserted by XLA
  (see parallel/).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nerf_fewshot_tpu.data.blender import BlenderDataset
from nerf_fewshot_tpu.models.mlp import NeRFMLP, NeRFWithDINO
from nerf_fewshot_tpu.ops.interp import grid_sample, resize_bilinear
from nerf_fewshot_tpu.ops.rays import (
    get_rays,
    project_points_script,
    project_points_to_image,
)
from nerf_fewshot_tpu.render.fused import fused_render_rays
from nerf_fewshot_tpu.render.pipeline import RenderSettings, render_rays
from nerf_fewshot_tpu.training.config import Config
from nerf_fewshot_tpu.training.losses import nerf_loss
from nerf_fewshot_tpu.training.metrics import LPIPSMetric, psnr, ssim
from nerf_fewshot_tpu.training.optim import (
    make_optimizer,
    multistep_lr,
    set_learning_rate,
)
from nerf_fewshot_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint
from nerf_fewshot_tpu.utils.logging import JSONLLogger, save_png
from nerf_fewshot_tpu.utils.profiling import RateMeter


# Test hook: when True, Pallas-kernel eligibility ignores the backend check
# and kernels run in interpret mode — lets CPU tests exercise the exact
# trainer dispatch (incl. the shard_map DP kernel path) without a TPU.
FORCE_INTERPRET_KERNELS = False


@dataclasses.dataclass
class PhaseData:
    """Per-phase, per-view device-resident ray data."""

    rays_o: jnp.ndarray  # (V, HW, 3)
    rays_d: jnp.ndarray  # (V, HW, 3)
    targets: jnp.ndarray  # (V, HW, 3)
    H: int
    W: int


def _feature_sampler(feat_map, pose, focal, H, W, align_corners=False,
                     invalid_fill="zeros", projection="reference"):
    """Per-point conditioning closure: project 3D points into the feature
    view, bilinear-sample the map (reference: train.py:210-221).

    ``align_corners`` selects the grid_sample convention: False for the
    config-driven path (dino_feature_model.py:135-140), True for the
    standalone scripts (train_lora.py:128). ``invalid_fill='mean'``
    reproduces the multiscale trainer's quirk (train_multiscale.py:185-196):
    features of invalid projections (behind camera / outside the image) are
    replaced with the batch-mean feature — where the mean is taken over *all*
    sampled features including the zero-filled invalid ones, exactly as the
    reference computes it.

    ``projection`` selects the geometry convention: 'reference' is the
    proper-inverse projection the config-driven and multiscale trainers use
    (ray_utils.py:176-209 via project_points_to_image); 'script' is the
    standalone scripts' inline ``(p - t) @ R.T`` chain — forward rotation,
    no inverse, no validity mask (train_lora.py:118-124). The two agree only
    for identity-rotation poses; script recipes must use 'script'."""

    def fn(pts):
        if projection == "script":
            pts2d, _ = project_points_script(pts, pose, focal, H, W)
            return grid_sample(feat_map, pts2d, align_corners=align_corners)
        pts2d, _, valid = project_points_to_image(pts, pose, focal, H, W)
        f = grid_sample(feat_map, pts2d, align_corners=align_corners)
        if invalid_fill == "mean":
            mean = jnp.mean(f, axis=0, keepdims=True)
            f = jnp.where(valid[:, None], f, mean)
        return f

    return fn


class Trainer:
    """Few-shot NeRF trainer (single-host; see parallel/ for mesh wrapping)."""

    def __init__(
        self,
        cfg: Config,
        train_data: BlenderDataset,
        test_data: Optional[BlenderDataset] = None,
        dino_features: Optional[np.ndarray] = None,  # (V, Hp, Wp, D)
        mesh: Optional[jax.sharding.Mesh] = None,
        log_path: Optional[str] = None,
    ):
        self.cfg = cfg
        self.mesh = mesh
        self.train_data = train_data
        self.test_data = test_data
        self.H, self.W, self.focal = train_data.H, train_data.W, train_data.focal
        self.targets_full = jnp.asarray(train_data.white_composited())  # (V,H,W,3)
        self.poses = jnp.asarray(train_data.poses)
        self.n_views = train_data.n_views

        self.use_dino = cfg.dino.use_dino and dino_features is not None
        self.dino_features = (
            jnp.asarray(dino_features) if self.use_dino else None
        )

        # Model -------------------------------------------------------------
        if cfg.nerf.arch == "module":
            self.model = NeRFWithDINO(
                pos_freq=cfg.nerf.pos_freq,
                dir_freq=cfg.nerf.dir_freq,
                dino_dim=cfg.dino.output_dim,
                hidden_dim=cfg.nerf.hidden_dim,
                num_density_layers=cfg.nerf.num_layers,
            )
        else:
            self.model = NeRFMLP(
                pos_freq=cfg.nerf.pos_freq,
                dir_freq=cfg.nerf.dir_freq,
                use_viewdirs=cfg.nerf.use_viewdirs,
                dino_dim=cfg.dino.output_dim if self.use_dino else 0,
                hidden_dim=cfg.nerf.hidden_dim,
                num_layers=cfg.nerf.num_layers,
                skip_layers=tuple(cfg.nerf.skip_layers),
                lora_rank=cfg.nerf.lora_rank,
                lora_alpha=cfg.nerf.lora_alpha,
                sigma_bias_init=cfg.nerf.sigma_bias,
            )

        key = jax.random.key(cfg.seed)
        k_init, self.key = jax.random.split(key)
        dummy_pts = jnp.zeros((1, 3))
        dummy_dirs = jnp.zeros((1, 3))
        if cfg.nerf.arch == "module":
            dummy_dino = jnp.zeros((1, cfg.dino.output_dim))
            self.params = self.model.init(
                k_init, dummy_pts, dummy_dirs, dummy_dino
            )["params"]
        elif self.use_dino:
            dummy_dino = jnp.zeros((1, cfg.dino.output_dim))
            self.params = self.model.init(
                k_init, dummy_pts, dummy_dirs, dummy_dino
            )["params"]
        else:
            self.params = self.model.init(k_init, dummy_pts, dummy_dirs)["params"]

        # Optimizer ---------------------------------------------------------
        self.lr_at = multistep_lr(
            cfg.optimizer.lr, cfg.optimizer.lr_milestones, cfg.optimizer.lr_gamma
        )
        self.tx = make_optimizer(cfg.optimizer, self.params)
        self.opt_state = self.tx.init(self.params)
        self._lora_only_active = False

        self.epoch = 0
        self.best_psnr = 0.0
        # consecutive epochs the dead-sigma probe reported acc == 0
        # (VERDICT r4 item 4b — annotates runs that sit in the zero-gradient
        # collapse basin instead of leaving a silent PSNR-1.84 table row)
        self.dead_sigma_epochs = 0
        self._phase_data: Dict[int, PhaseData] = {}
        self._step_fns: Dict[int, Callable] = {}
        self._np_rng = np.random.default_rng(cfg.seed)
        self.logger = JSONLLogger(
            path=log_path, run_name=cfg.name, config=cfg.raw,
            use_wandb=cfg.output.use_wandb,
            wandb_project=cfg.output.wandb_project,
        )
        self.lpips = LPIPSMetric()
        self.rate_meter = RateMeter()

    # ------------------------------------------------------------------ model

    def feature_sampler(self, feat_map, pose):
        """Config-bound feature sampler (align_corners, invalid-fill and
        projection convention from the DINO config)."""
        return _feature_sampler(
            feat_map, pose, self.focal, self.H, self.W,
            align_corners=self.cfg.dino.align_corners,
            invalid_fill=self.cfg.dino.invalid_fill,
            projection=self.cfg.dino.projection,
        )

    def _model_fn(self, params):
        """Close params into a (pts, dirs, dino) -> (rgb, sigma) callable."""

        def fn(pts, dirs, dino):
            if self.cfg.nerf.arch == "module":
                rgb, sigma = self.model.apply(
                    {"params": params}, pts, dirs, dino
                )
            elif self.use_dino:
                rgb, sigma = self.model.apply({"params": params}, pts, dirs, dino)
            else:
                rgb, sigma = self.model.apply({"params": params}, pts, dirs)
            return rgb, sigma

        return fn

    def _kernel_ineligible_reason(self) -> Optional[str]:
        """Why the Pallas kernels cannot run this config (None = eligible).

        The fused kernels assume a *uniform* H→H trunk (pack_params,
        render/kernels.py) — skip connections change layer shapes and are
        rejected rather than mis-packed. LoRA is supported by merging
        ``W + (α/r)·A·B`` into the trunk weights, which is exact because
        LoRA dropout is inference-mode (identity) on BOTH backends: the
        reference's trainers never put the model in a mode where trunk-LoRA
        dropout is exercised (the standalone scripts' NeRFMLP class is
        missing from the repo, and the config path's LoRA lives in the
        precomputed-feature DINO where it is gradient-dead, train.py:158-169).
        """
        cfg = self.cfg
        if cfg.nerf.arch == "module":
            return "arch=module (NeRFWithDINO) has no kernel packing"
        if cfg.nerf.skip_layers:
            return (
                f"skip_layers={list(cfg.nerf.skip_layers)} — the fused "
                "kernels require a uniform trunk (pack_params assumes "
                "hidden→hidden layers)"
            )
        if cfg.nerf.hidden_dim % 128 != 0:
            return f"hidden_dim={cfg.nerf.hidden_dim} not 128-lane aligned"
        if not (cfg.strict_reference_behavior or cfg.rendering.noise_std == 0.0):
            return "sigma noise_std != 0 is not implemented in the kernels"
        if not (jax.default_backend() in ("tpu", "axon")
                or FORCE_INTERPRET_KERNELS):
            return f"backend {jax.default_backend()!r} is not a TPU"
        return None

    def _kernel_eligible(self) -> bool:
        """Pallas kernel eligibility (mesh-independent): functional NeRFMLP
        arch with a uniform trunk (no skip connections), 128-lane-aligned
        width, no sigma noise (strict reference behavior never applies it),
        TPU backend (or the test interpret hook)."""
        if self.cfg.rendering.backend == "xla":
            return False
        return self._kernel_ineligible_reason() is None

    def _use_fused(self) -> bool:
        """Fused Pallas *renderer* eligibility. Under a device mesh the
        plain renderer path stays on XLA (jit sharding annotations cannot
        partition a pallas_call); the sharded train step instead goes
        through parallel/fused_dp's shard_map wrapper (see
        _make_step_fn)."""
        b = self.cfg.rendering.backend
        if b == "xla":
            return False
        if b == "fused":
            reason = self._kernel_ineligible_reason()
            if reason is not None:
                raise ValueError(f"rendering.backend=fused rejected: {reason}")
            return self.mesh is None
        return self._kernel_eligible() and self.mesh is None  # auto

    def _ray_render_fn(self, params, settings: RenderSettings, key, pf,
                       forward_only: bool = False):
        """(rays_o, rays_d) -> RenderOutputs on the configured backend.

        ``forward_only`` (eval rendering): use the no-VJP inline-PE forward
        kernel — not differentiable w.r.t. params."""
        if self._use_fused():
            cfg = self.cfg

            def fn(ro, rd):
                return fused_render_rays(
                    params, ro, rd, settings,
                    pos_freq=cfg.nerf.pos_freq, dir_freq=cfg.nerf.dir_freq,
                    num_layers=cfg.nerf.num_layers,
                    hidden_dim=cfg.nerf.hidden_dim,
                    use_viewdirs=cfg.nerf.use_viewdirs,
                    lora_alpha=cfg.nerf.lora_alpha,
                    key=key, point_features_fn=pf,
                    interpret=FORCE_INTERPRET_KERNELS,
                    compute_dtype=cfg.rendering.compute_dtype,
                    forward_only=forward_only,
                )

            return fn

        def fn(ro, rd):
            return render_rays(
                self._model_fn(params), ro, rd, settings, key=key,
                point_features_fn=pf,
            )

        return fn

    def _render_settings(self, n_samples: int, training: bool) -> RenderSettings:
        cfg = self.cfg
        noise = 0.0
        if training and not cfg.strict_reference_behavior:
            noise = cfg.rendering.noise_std
        return RenderSettings(
            near=cfg.rendering.near,
            far=cfg.rendering.far,
            n_samples=n_samples,
            n_importance=cfg.rendering.n_importance,
            perturb=training,
            noise_std=noise,
            white_bkgd=cfg.rendering.white_bkgd,
            lindisp=cfg.rendering.lindisp,
        )

    # ------------------------------------------------------------- phase data

    def phase_data(self, phase_idx: int) -> PhaseData:
        """Per-phase ray/target prep, built host-side with the native C++
        ops (native/nerf_native.cpp get_rays + resize_bilinear; numpy
        fallback, parity pinned by tests/test_native.py) and uploaded in one
        transfer — per-op dispatch through the remote TPU runtime costs more
        than the whole prep."""
        if phase_idx in self._phase_data:
            return self._phase_data[phase_idx]
        from nerf_fewshot_tpu import native

        p = self.cfg.phases[phase_idx]
        Hp, Wp = p.H, p.W
        # Focal handling differs by reference surface: the config-driven
        # trainer scales focal with the downsampled resolution
        # (train.py:267); the standalone scripts and the multiscale trainer
        # pass the FULL-resolution focal to get_rays at downsampled sizes
        # (train_lora.py:110, train_multiscale.py:138) — their low-res
        # phases render a narrow-FOV center crop against a full-image
        # downsampled target. Reproduced via cfg.focal_scaling.
        focal = self.focal * (Hp / self.H) if self.cfg.focal_scaling else self.focal
        targets_np = np.asarray(self.targets_full)
        poses_np = np.asarray(self.poses)
        ros, rds, tgts = [], [], []
        for v in range(self.n_views):
            ro, rd = native.get_rays(Hp, Wp, focal, poses_np[v])
            tgt = targets_np[v]
            if (Hp, Wp) != (self.H, self.W):
                tgt = native.resize_bilinear(tgt, Hp, Wp)  # train.py:270
            ros.append(ro.reshape(-1, 3))
            rds.append(rd.reshape(-1, 3))
            tgts.append(tgt.reshape(-1, 3))
        pd = PhaseData(
            rays_o=jnp.asarray(np.stack(ros)),
            rays_d=jnp.asarray(np.stack(rds)),
            targets=jnp.asarray(np.stack(tgts)),
            H=Hp,
            W=Wp,
        )
        self._phase_data[phase_idx] = pd
        return pd

    # ------------------------------------------------------------- train step

    def _make_step_fn(self, phase_idx: int) -> Callable:
        if phase_idx in self._step_fns:
            return self._step_fns[phase_idx]
        p = self.cfg.phases[phase_idx]
        pd = self.phase_data(phase_idx)
        settings = self._render_settings(p.n_samples, training=True)
        cfg = self.cfg
        use_dino = self.use_dino
        rgb_only = cfg.strict_reference_behavior

        def loss_fn(params, key, ro, rd, tgt, mask, feat_map, feat_pose):
            pf = None
            if use_dino:
                pf = self.feature_sampler(feat_map, feat_pose)
            out = self._ray_render_fn(params, settings, key, pf)(ro, rd)
            losses = nerf_loss(
                out.rgb,
                tgt,
                cfg.loss,
                weights=None if rgb_only else out.weights,
                mask=mask,
            )
            return losses["total"], losses

        # Single-pass fused objective kernel: eligible for the
        # strict-reference rgb MSE AND (round 5) the non-strict rgb + w²-reg
        # objective, which the kernel computes in-pass (reg_weight below;
        # depth L1 never activates — the pipeline has no depth targets,
        # reference train.py:282-283, so rgb+reg IS the full non-strict
        # loss). Under a device mesh it dispatches through
        # parallel/fused_dp's shard_map wrapper (jit sharding annotations
        # cannot partition a pallas_call): each device runs the kernel on its
        # ray shard, loss/grads psum over ICI against the *global* valid-ray
        # count. DINO conditioning rides the same path: the per-view feature
        # map + pose enter shard_map as replicated operands and the feature
        # sampler runs as an XLA prologue on each device's local ray shard
        # (reference hot loop: train.py:210-221).
        use_train_kernel = self._kernel_eligible()
        kernel_reg_weight = 0.0 if rgb_only else float(cfg.loss.reg_weight)
        interpret = FORCE_INTERPRET_KERNELS
        dp_kernel_fn = None
        if use_train_kernel and self.mesh is not None:
            from nerf_fewshot_tpu.parallel.fused_dp import (
                make_dp_fused_loss_grad,
            )

            dp_kernel_fn = make_dp_fused_loss_grad(
                self.mesh, settings,
                pos_freq=cfg.nerf.pos_freq, dir_freq=cfg.nerf.dir_freq,
                num_layers=cfg.nerf.num_layers,
                hidden_dim=cfg.nerf.hidden_dim,
                use_viewdirs=cfg.nerf.use_viewdirs,
                lora_alpha=cfg.nerf.lora_alpha,
                interpret=interpret,
                compute_dtype=cfg.rendering.compute_dtype,
                axis_name=self.mesh.axis_names[0],
                point_features_builder=(
                    self.feature_sampler if use_dino else None
                ),
                reg_weight=kernel_reg_weight,
            )

        def loss_and_grad(params, key, ro, rd, tgt, mask, feat_map, feat_pose):
            if dp_kernel_fn is not None:
                if use_dino:
                    return dp_kernel_fn(
                        params, key, ro, rd, tgt, mask, feat_map, feat_pose
                    )
                return dp_kernel_fn(params, key, ro, rd, tgt, mask)
            if use_train_kernel:
                from nerf_fewshot_tpu.render.train_kernel import (
                    fused_train_loss_grad,
                )

                pf = None
                if use_dino:
                    pf = self.feature_sampler(feat_map, feat_pose)
                return fused_train_loss_grad(
                    params, ro, rd, tgt, mask, settings,
                    pos_freq=cfg.nerf.pos_freq, dir_freq=cfg.nerf.dir_freq,
                    num_layers=cfg.nerf.num_layers,
                    hidden_dim=cfg.nerf.hidden_dim,
                    use_viewdirs=cfg.nerf.use_viewdirs,
                    lora_alpha=cfg.nerf.lora_alpha,
                    key=key, point_features_fn=pf,
                    interpret=interpret,
                    compute_dtype=cfg.rendering.compute_dtype,
                    reg_weight=kernel_reg_weight,
                )
            (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, key, ro, rd, tgt, mask, feat_map, feat_pose
            )
            return loss, grads

        def epoch_fn(params, opt_state, keys, idxs, masks, ros, rds, tgts,
                     feat_maps, feat_poses):
            """The WHOLE epoch as two nested lax.scans (views × minibatch
            steps): one dispatch per epoch instead of one per view per step
            — per-call latency dominates small steps on a remote runtime.
            Leading axis of every scanned operand is the view."""

            def view_body(carry, xs):
                params, opt_state = carry
                keys_v, idx_v, mask_v, ro_v, rd_v, tgt_v, fm_v, fp_v = xs
                # One fused row-gather per step instead of three: TPU row
                # gathers are per-row-overhead bound (~0.1 ms per gather at
                # 2048 rows regardless of width), so packing [o|d|rgb] into
                # one (HW, 9) operand cuts the gather cost 3x (v5e).
                view_packed = jnp.concatenate([ro_v, rd_v, tgt_v], axis=1)

                def body(carry, xs):
                    params, opt_state = carry
                    key, idx, mask = xs
                    # Batch gather inside the jit; under DP the sharded
                    # indices gather from the replicated packed view rows.
                    row = view_packed[idx]
                    ro = row[:, 0:3]
                    rd = row[:, 3:6]
                    tgt = row[:, 6:9]
                    loss, grads = loss_and_grad(
                        params, key, ro, rd, tgt, mask, fm_v, fp_v
                    )
                    updates, opt_state = self.tx.update(
                        grads, opt_state, params
                    )
                    params = jax.tree_util.tree_map(
                        lambda q, u: q + u, params, updates
                    )
                    return (params, opt_state), loss

                carry, losses = jax.lax.scan(
                    body, (params, opt_state), (keys_v, idx_v, mask_v)
                )
                return carry, losses

            (params, opt_state), losses = jax.lax.scan(
                view_body, (params, opt_state),
                (keys, idxs, masks, ros, rds, tgts, feat_maps, feat_poses),
            )
            return params, opt_state, losses  # losses: (V, n_batches)

        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            data_s = NamedSharding(self.mesh, P(None, None, "data"))
            repl = NamedSharding(self.mesh, P())
            step_jit = jax.jit(
                epoch_fn,
                in_shardings=(
                    repl, repl, repl, data_s, data_s, repl, repl, repl,
                    repl, repl,
                ),
                out_shardings=(repl, repl, repl),
                donate_argnums=(0, 1),
            )
        else:
            step_jit = jax.jit(epoch_fn, donate_argnums=(0, 1))
        self._step_fns[phase_idx] = step_jit
        return step_jit

    def _phase_index(self, epoch: int) -> int:
        for i, p in enumerate(self.cfg.phases):
            if p.start_epoch <= epoch < p.end_epoch:
                return i
        if self.cfg.phases and epoch < self.cfg.phases[0].start_epoch:
            # A gapped/late-starting schedule must not silently train early
            # epochs at the FINAL phase's resolution (validate_config rejects
            # these for loaded configs; this guards programmatic ones).
            raise ValueError(
                f"epoch {epoch} precedes the first phase "
                f"(starts at {self.cfg.phases[0].start_epoch})"
            )
        return len(self.cfg.phases) - 1

    def _batch_granularity(self) -> int:
        if self.mesh is None:
            return 1
        return int(np.prod([self.mesh.shape[a] for a in self.mesh.axis_names]))

    def train_epoch(self, epoch: int) -> float:
        """One epoch over all views (reference: train.py:244-292)."""
        cfg = self.cfg
        phase_idx = self._phase_index(epoch)
        p = cfg.phases[phase_idx]
        pd = self.phase_data(phase_idx)
        step_fn = self._make_step_fn(phase_idx)

        # Two-phase LoRA freeze boundary (train_lora.py:89-93): fresh
        # optimizer over LoRA params only.
        boundary = cfg.optimizer.lora_only_after_epoch
        if boundary and epoch >= boundary and not self._lora_only_active:
            self.tx = make_optimizer(cfg.optimizer, self.params, lora_only=True)
            self.opt_state = self.tx.init(self.params)
            self._lora_only_active = True
            self._step_fns.clear()
            step_fn = self._make_step_fn(phase_idx)

        set_learning_rate(self.opt_state, self.lr_at(epoch))

        n_rays = pd.rays_o.shape[1]
        B = min(p.batch_size, n_rays)
        # pad B to the mesh size so shards are equal
        g = self._batch_granularity()
        B = ((B + g - 1) // g) * g
        n_batches = (n_rays + B - 1) // B

        V = self.n_views

        # One key-split dispatch per epoch instead of per step.
        n_steps = V * n_batches
        epoch_keys = jax.random.split(self.key, n_steps + 1)
        self.key = epoch_keys[0]
        keys = epoch_keys[1:].reshape(V, n_batches)

        # Stack every view's minibatches for the epoch scan (pad the ragged
        # tail; masks keep gradients exact — losses.py masked means).
        pad_total = n_batches * B - n_rays
        idxs = np.empty((V, n_batches, B), np.int64)
        masks = np.ones((V, n_batches * B), np.float32)
        for v in range(V):
            perm = self._np_rng.permutation(n_rays)
            idxs[v] = np.concatenate(
                [perm, np.zeros(pad_total, perm.dtype)]
            ).reshape(n_batches, B)
            if pad_total:
                masks[v, n_rays:] = 0.0
        masks = masks.reshape(V, n_batches, B)

        if self.use_dino:
            feat_maps = self.dino_features
            feat_poses = self.poses
        else:
            feat_maps = jnp.zeros((V, 1, 1, 1), jnp.float32)
            feat_poses = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32),
                                          (V, 4, 4))

        # ONE dispatch for the whole epoch; the loss fetch below is the
        # only sync (fetching per step/view would serialize dispatch with
        # execution — costly through a remote runtime).
        self.params, self.opt_state, losses = step_fn(
            self.params,
            self.opt_state,
            keys,
            jnp.asarray(idxs),
            jnp.asarray(masks),
            pd.rays_o,
            pd.rays_d,
            pd.targets,
            feat_maps,
            feat_poses,
        )
        return float(jnp.mean(losses))

    # ------------------------------------------------------------- health

    def dead_sigma_probe(self) -> float:
        """Max accumulated alpha over one chunk of train-view-0 rays.

        Exactly 0.0 means relu(sigma) was zero at EVERY sampled point of the
        probe rays — the dead-sigma state where alpha compositing has exactly
        zero gradient and training can never escape (the reference shares the
        hazard: relu-sigma compositing, reference volume_renderer.py:32-38 /
        nerf_mlp.py:193-202; see models/mlp.py sigma_bias_init). Reuses the
        cached compiled eval-chunk renderer (same cache key as evaluate), so
        it adds no compiles beyond the eval path's own.
        """
        cfg = self.cfg
        chunk_size = cfg.rendering.chunk_size
        fn = self._eval_chunk_fn(cfg.phases[-1].n_samples, chunk_size)
        pd = self.phase_data(self._phase_index(self.epoch))
        ro = pd.rays_o[0].reshape(-1, 3)
        rd = pd.rays_d[0].reshape(-1, 3)
        if ro.shape[0] >= chunk_size:
            ro, rd = ro[:chunk_size], rd[:chunk_size]
        else:
            reps = -(-chunk_size // ro.shape[0])
            ro = jnp.tile(ro, (reps, 1))[:chunk_size]
            rd = jnp.tile(rd, (reps, 1))[:chunk_size]
        feat_map = (
            self.dino_features[0] if self.use_dino
            else jnp.zeros((1, 1, 1), jnp.float32)
        )
        feat_pose = self.poses[0] if self.use_dino else jnp.eye(4)
        _, _, acc = fn(self.params, ro, rd, feat_map, feat_pose)
        return float(jnp.max(acc))

    # ------------------------------------------------------------------- eval

    def _eval_chunk_fn(self, n_samples: int, chunk_size: int):
        """Cached jitted per-chunk eval renderer (recreating closures per
        call would re-trace through the remote compiler every eval)."""
        key = ("eval", n_samples, chunk_size)
        if key in self._step_fns:
            return self._step_fns[key]
        settings = self._render_settings(n_samples, training=False)
        use_dino = self.use_dino

        def chunk(params, ro, rd, feat_map, feat_pose):
            pf = None
            if use_dino:
                pf = self.feature_sampler(feat_map, feat_pose)
            out = self._ray_render_fn(
                params, settings, None, pf, forward_only=True
            )(ro, rd)
            return out.rgb, out.depth, out.acc

        fn = jax.jit(chunk)
        self._step_fns[key] = fn
        return fn

    def render_view(
        self, pose, n_samples: Optional[int] = None
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Full-image render of an arbitrary pose with the cached compiled
        chunk renderer. Returns (rgb, depth, acc) numpy arrays."""
        cfg = self.cfg
        if n_samples is None:
            n_samples = cfg.phases[-1].n_samples
        chunk_size = cfg.rendering.chunk_size
        fn = self._eval_chunk_fn(n_samples, chunk_size)
        ro, rd = get_rays(self.H, self.W, self.focal, jnp.asarray(pose))
        n = self.H * self.W
        ro = ro.reshape(-1, 3)
        rd = rd.reshape(-1, 3)
        pad = (-n) % chunk_size
        if pad:
            ro = jnp.concatenate([ro, jnp.broadcast_to(ro[-1:], (pad, 3))])
            rd = jnp.concatenate([rd, jnp.broadcast_to(rd[-1:], (pad, 3))])
        feat_map = (
            self.dino_features[0] if self.use_dino
            else jnp.zeros((1, 1, 1), jnp.float32)
        )
        feat_pose = self.poses[0] if self.use_dino else jnp.eye(4)
        rgbs, depths, accs = [], [], []
        for c in range(ro.shape[0] // chunk_size):
            sl = slice(c * chunk_size, (c + 1) * chunk_size)
            rgb, depth, acc = fn(self.params, ro[sl], rd[sl], feat_map, feat_pose)
            rgbs.append(rgb)
            depths.append(depth)
            accs.append(acc)
        rgb = jnp.concatenate(rgbs)[:n].reshape(self.H, self.W, 3)
        depth = jnp.concatenate(depths)[:n].reshape(self.H, self.W)
        acc = jnp.concatenate(accs)[:n].reshape(self.H, self.W)
        return np.asarray(rgb), np.asarray(depth), np.asarray(acc)

    def render_views(
        self, poses, n_samples: Optional[int] = None
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Batched multi-pose render: all poses' rays stream through ONE
        sequence of cached compiled chunk calls instead of V separate
        ``render_view`` invocations — V× fewer dispatch/sync round-trips,
        which matters for serving through a remote runtime (and for the
        test-split eval loop). Returns (V, H, W[, 3]) rgb / depth / acc.

        Reuses ``_eval_chunk_fn``'s cache (same chunk_size key), so no new
        compiles versus ``render_view``.
        """
        cfg = self.cfg
        if n_samples is None:
            n_samples = cfg.phases[-1].n_samples
        chunk_size = cfg.rendering.chunk_size
        fn = self._eval_chunk_fn(n_samples, chunk_size)
        V = len(poses)
        per = self.H * self.W
        ros, rds = [], []
        for pose in poses:
            ro, rd = get_rays(self.H, self.W, self.focal, jnp.asarray(pose))
            ros.append(ro.reshape(-1, 3))
            rds.append(rd.reshape(-1, 3))
        ro = jnp.concatenate(ros)
        rd = jnp.concatenate(rds)
        n = V * per
        pad = (-n) % chunk_size
        if pad:
            ro = jnp.concatenate([ro, jnp.broadcast_to(ro[-1:], (pad, 3))])
            rd = jnp.concatenate([rd, jnp.broadcast_to(rd[-1:], (pad, 3))])
        feat_map = (
            self.dino_features[0] if self.use_dino
            else jnp.zeros((1, 1, 1), jnp.float32)
        )
        feat_pose = self.poses[0] if self.use_dino else jnp.eye(4)
        rgbs, depths, accs = [], [], []
        for c in range(ro.shape[0] // chunk_size):
            sl = slice(c * chunk_size, (c + 1) * chunk_size)
            rgb, depth, acc = fn(self.params, ro[sl], rd[sl], feat_map,
                                 feat_pose)
            rgbs.append(rgb)
            depths.append(depth)
            accs.append(acc)
        rgb = jnp.concatenate(rgbs)[:n].reshape(V, self.H, self.W, 3)
        depth = jnp.concatenate(depths)[:n].reshape(V, self.H, self.W)
        acc = jnp.concatenate(accs)[:n].reshape(V, self.H, self.W)
        return np.asarray(rgb), np.asarray(depth), np.asarray(acc)

    def evaluate(
        self, max_views: Optional[int] = None, dump_dir: Optional[str] = None
    ) -> Dict[str, float]:
        """Full-resolution chunked eval on the test split
        (reference: train.py:294-342). DINO features come from train view 0
        regardless of test pose — the reference's eval quirk
        (train.py:204-213), reproduced under strict_reference_behavior."""
        if self.test_data is None:
            return {}
        cfg = self.cfg
        test_targets = self.test_data.white_composited()
        n = self.test_data.n_views if max_views is None else min(
            max_views, self.test_data.n_views
        )
        all_psnr, all_ssim, all_lpips = [], [], []
        # one batched chunk stream over every eval view's rays (V× fewer
        # dispatch round-trips than per-view render_view calls)
        rendered, _, _ = self.render_views(
            [self.test_data.poses[i] for i in range(n)]
        )
        for i in range(n):
            rgb_np = rendered[i]
            pred = jnp.asarray(rgb_np)
            tgt = jnp.asarray(test_targets[i])
            all_psnr.append(float(psnr(pred, tgt)))
            all_ssim.append(float(ssim(pred, tgt)))
            lp = self.lpips(np.asarray(pred), np.asarray(tgt))
            if lp is not None:
                all_lpips.append(lp)
            if dump_dir is not None and i < 5:
                save_png(
                    os.path.join(dump_dir, f"render_{i}.png"),
                    np.clip(np.asarray(pred), 0, 1),
                )
                save_png(
                    os.path.join(dump_dir, f"gt_{i}.png"), np.asarray(tgt)
                )
        metrics = {
            "psnr": float(np.mean(all_psnr)),
            "ssim": float(np.mean(all_ssim)),
        }
        if all_lpips:
            metrics["lpips"] = float(np.mean(all_lpips))
            # Provenance: a random-init-feature LPIPS is a valid distance but
            # its absolute scale is NOT comparable to the reference's
            # published pretrained-VGG numbers (train.py:324-329) — make
            # every artifact that carries the number self-describing.
            metrics["lpips_pretrained"] = bool(self.lpips.pretrained)
            metrics["lpips_backend"] = str(self.lpips.backend)
        return metrics

    # ------------------------------------------------------------------ train

    def fit(self, epochs: Optional[int] = None) -> Dict[str, float]:
        import time

        cfg = self.cfg
        epochs = epochs if epochs is not None else cfg.epochs
        metrics: Dict[str, float] = {}
        for epoch in range(self.epoch, epochs):
            self.epoch = epoch
            t0 = time.perf_counter()
            loss = self.train_epoch(epoch)
            # rays/s·chip — the headline throughput metric, per-epoch in the
            # log (train_epoch syncs on its losses, so the wall time is real)
            pd = self.phase_data(self._phase_index(epoch))
            rate = self.rate_meter.update(
                self.n_views * pd.rays_o.shape[1], time.perf_counter() - t0
            )
            self.logger.log(
                {"epoch": epoch, "train_loss": loss, "lr": self.lr_at(epoch),
                 "rays_per_sec": rate}
            )
            probe_acc = self.dead_sigma_probe()
            if probe_acc <= 0.0:
                self.dead_sigma_epochs += 1
                print(
                    f"[DEAD-SIGMA] epoch {epoch}: accumulated alpha is "
                    f"exactly 0 over the probe chunk — relu(sigma) is zero "
                    f"at every sampled point, gradients are exactly zero and "
                    f"training cannot recover ({self.dead_sigma_epochs} "
                    f"consecutive epoch(s)). Consider nerf_model.sigma_bias: "
                    f"0.1 or a different seed."
                )
                self.logger.log(
                    {"epoch": epoch, "dead_sigma": True,
                     "dead_sigma_epochs": self.dead_sigma_epochs}
                )
            else:
                self.dead_sigma_epochs = 0
            if (epoch + 1) % cfg.output.val_freq == 0:
                dump = os.path.join(cfg.output.save_dir, f"epoch_{epoch}")
                metrics = self.evaluate(dump_dir=dump)
                self.logger.log({"epoch": epoch, **metrics})
                if metrics.get("psnr", 0.0) > self.best_psnr:
                    self.best_psnr = metrics["psnr"]
                    self.save(os.path.join(cfg.output.save_dir, "best.ckpt"))
            if (epoch + 1) % cfg.output.save_freq == 0:
                self.save(
                    os.path.join(cfg.output.save_dir, f"epoch_{epoch + 1}.ckpt")
                )
        return metrics

    # ------------------------------------------------------------- checkpoint

    def save(self, path: str) -> None:
        save_checkpoint(
            path,
            {"params": self.params, "opt_state": self.opt_state},
            metadata={
                "epoch": self.epoch,
                "best_psnr": self.best_psnr,
                "config": self.cfg.raw,
            },
        )

    def load(self, path: str) -> None:
        if path.endswith((".pth", ".pt")):
            self.load_torch(path)
            return
        tree, meta = restore_checkpoint(
            path, {"params": self.params, "opt_state": self.opt_state}
        )
        self.params = tree["params"]
        self.opt_state = tree["opt_state"]
        if meta:
            self.epoch = int(meta.get("epoch", 0)) + 1
            self.best_psnr = float(meta.get("best_psnr", 0.0))

    def load_torch(self, path: str) -> None:
        """Import a *reference* torch checkpoint file. Handles both of the
        reference's incompatible key schemas — ``nerf_model_state_dict``
        (train.py:378) and ``nerf_state_dict`` (train_multiscale.py:370) —
        and bare state_dicts. Optimizer state is re-initialized (torch Adam
        moments don't transfer across frameworks meaningfully)."""
        from nerf_fewshot_tpu.utils.torch_import import (
            import_nerf_mlp_state_dict,
            import_nerf_with_dino_state_dict,
            load_torch_checkpoint,
        )

        ckpt = load_torch_checkpoint(path)
        sd = None
        for key in ("nerf_model_state_dict", "nerf_state_dict"):
            if isinstance(ckpt, dict) and key in ckpt:
                sd = ckpt[key]
                break
        if sd is None:
            sd = ckpt  # bare state_dict
        sd = {k: (v.numpy() if hasattr(v, "numpy") else v)
              for k, v in sd.items()}
        if self.cfg.nerf.arch == "module":
            self.params = import_nerf_with_dino_state_dict(self.params, sd)
        else:
            self.params = import_nerf_mlp_state_dict(self.params, sd)
        self.opt_state = self.tx.init(self.params)
        if isinstance(ckpt, dict) and "epoch" in ckpt:
            try:
                self.epoch = int(ckpt["epoch"]) + 1
            except (TypeError, ValueError):
                pass
