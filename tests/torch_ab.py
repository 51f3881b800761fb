"""Torch A/B mirror of the reference training loop.

Reimplements reference training/training.py:71-181 (solve_model) +
:184-243 (two-phase training) in torch, on a model built from the SAME
initial parameters as our JAX model, so a head-to-head PSNR comparison
isolates the training-dynamics parity of the TPU framework from init
randomness.  Sampling follows data/IndexDataset.py:90-96 (uniform IID
integer voxel positions, so GT interpolation reduces to an exact gather —
the identity proven in tests/test_interpolation.py).

Used by tests/test_ab_parity.py (slow-marked) and the BENCH_NOTES A/B
studies examples/ab_seed_sweep.py (free-stream, multi-seed) and
examples/ab_stream_matched.py (exact stream-matched comparison).
"""

from __future__ import annotations

import math

import numpy as np
import torch

from tests.test_dwt import TorchOracle3d


def jax_pos_stream(k_train_phase, steps_per_chunk, N, res, n_chunks=10000):
    """Replay the jax trainer's per-phase position draws as an iterator.

    Mirrors trainer._scan_chunk's key chain exactly: per chunk
    `key, k_pos, k_gate = split(key, 3)`, then one (steps, N, 3) randint.
    Driving solve_model_torch with this stream removes sampling-stream luck
    from the A/B comparison entirely: with it, torch and jax PSNRs agree to
    <0.001 dB (examples/ab_stream_matched.py), proving the training
    dynamics (forward, loss, Adam, lr strategy, phase structure) are
    exactly equivalent."""
    import jax
    import jax.numpy as jnp
    key = k_train_phase
    res = jnp.asarray(res, jnp.int32)
    for _ in range(n_chunks):
        key, k_pos, _k_gate = jax.random.split(key, 3)
        pos_all = jax.random.randint(k_pos, (steps_per_chunk, N, 3), 0,
                                     res[None, None, :])
        for s in np.asarray(pos_all):
            yield s


def jax_gate_noise_stream(k_train_phase, steps_per_chunk, shapes,
                          n_chunks=10000):
    """Replay the jax trainer's per-step variational noise draws.

    Mirrors _scan_chunk + decode_volume exactly: per chunk
    `key, k_pos, k_gate = split(key, 3)`, `gate_keys = split(k_gate, steps)`;
    per step `keys = split(gate_keys[s], n_levels)` and
    `xi_i = normal(keys[i], shapes[i])` (gates.apply_gate).  Yields a list of
    per-level xi arrays per step."""
    import jax
    key = k_train_phase
    for _ in range(n_chunks):
        key, _k_pos, k_gate = jax.random.split(key, 3)
        gate_keys = jax.random.split(k_gate, steps_per_chunk)
        for skey in gate_keys:
            keys = jax.random.split(skey, len(shapes))
            yield [torch.from_numpy(np.asarray(
                jax.random.normal(k, tuple(sh)))) for k, sh in
                zip(keys, shapes)]


class TorchMirror:
    """Differentiable torch twin of (spec, params): dense, smallify,
    masked_straight_through, static_variational or dynamic_variational
    gates (the latter with the jointly-trained Variance_Model,
    Variational_Dropout_Layer.py:159-175)."""

    def __init__(self, spec, params, variational_sigma=-7.0,
                 var_params=None):
        t = lambda a: torch.from_numpy(np.asarray(a)).clone()
        self.spec = spec
        self.drop_type = spec.drop_type
        self.variational_sigma = variational_sigma
        # dynamic-variational variance model (transplanted from the jax init
        # so both sides start identical; reference training/training.py:80-84
        # adds its params to the same Adam)
        self.var_ws = self.var_bs = None
        if var_params is not None:
            self.var_ws = [t(w).requires_grad_(True) for w in var_params['w']]
            self.var_bs = [t(b).requires_grad_(True) for b in var_params['b']]
        self.coeffs = [t(c).requires_grad_(True) for c in params.coeffs]
        self.ws = [t(w).requires_grad_(True) for w in params.mlp_w]
        self.bs = [t(b).requires_grad_(True) for b in params.mlp_b]
        self.betas = None
        self.ema = None
        self.ema_var = None
        self.mask_values = None
        self.log_thetas = None
        self.log_var = None
        self.weight_dkl = None     # VariationalDropoutLoss ramp state
        self.d_masks = None        # frozen masks after bake (phase 2)
        if spec.drop_type == 'smallify':
            assert params.gates is not None
            self.betas = [t(b).requires_grad_(True)
                          for b in params.gates.betas]
            # tracker init (Smallify_Dropout.py:88-92)
            self.ema = [torch.sign(b.detach()) for b in self.betas]
            self.ema_var = [torch.zeros_like(b.detach()) for b in self.betas]
        elif spec.drop_type == 'masked_straight_through':
            self.mask_values = [t(m).requires_grad_(True)
                                for m in params.gates.mask_values]
        elif 'variational' in spec.drop_type:
            self.log_thetas = [t(x).requires_grad_(True)
                               for x in params.gates.log_thetas]
            self.log_var = [t(x).requires_grad_(True)
                            for x in params.gates.log_var]
        elif spec.drop_type:
            raise NotImplementedError(spec.drop_type)
        # none-mode (zero decode levels) needs no wavelet oracle
        self.oracle = (TorchOracle3d(spec.wavelet)
                       if spec.level_shapes else None)

    @property
    def variational(self):
        return self.drop_type and 'variational' in self.drop_type

    @property
    def dynamic(self):
        return self.variational and 'dynamic' in self.drop_type

    def parameters(self):
        ps = self.coeffs + self.ws + self.bs
        for extra in (self.betas, self.mask_values, self.log_thetas,
                      self.log_var):
            if extra is not None:
                ps = ps + extra
        # reference adds the Variance_Model to the same optimizer in phase 1
        # (training/training.py:80-84); in phase 2 it gets no grads (the loss
        # is plain MSE) so torch Adam leaves it untouched — same as jax
        if self.dynamic and self.var_ws is not None:
            ps = ps + self.var_ws + self.var_bs
        return ps

    def forward_variance(self, x: torch.Tensor) -> torch.Tensor:
        """Variance_Model.forward (Variational_Dropout_Layer.py:170-175):
        ReLU after every hidden layer, linear head."""
        for w, b in zip(self.var_ws[:-1], self.var_bs[:-1]):
            x = torch.relu(x @ w + b)
        return x @ self.var_ws[-1] + self.var_bs[-1]

    def dkl_sum(self):
        """sum of per-level Molchanov KL (Variational_Dropout_Layer.py:115-122)."""
        k1, k2, k3 = 0.63576, 1.87320, 1.48695
        total = 0.0
        for lt, lv in zip(self.log_thetas, self.log_var):
            log_alpha = lv - 2.0 * lt
            t1 = k1 * torch.sigmoid(k2 + k3 * log_alpha)
            t2 = 0.5 * torch.nn.functional.softplus(-log_alpha)
            total = total + torch.sum(-t1 + t2 + k1)
        return total

    def decode(self, train_gates: bool, xi_list=None):
        gated = self.coeffs
        if train_gates and self.drop_type:
            if self.d_masks is not None:
                # post-bake: frozen d_mask path (Smallify_Dropout.py:60,
                # Straight_Through_Dropout.py:58-59,
                # Variational_Dropout_Layer.py:109-112)
                gated = [c * m.unsqueeze(0)
                         for c, m in zip(self.coeffs, self.d_masks)]
            elif self.drop_type == 'smallify':
                gated = [c * b.unsqueeze(0)
                         for c, b in zip(self.coeffs, self.betas)]
            elif self.drop_type == 'masked_straight_through':
                # (x*(m>=t) - x*m).detach() + x*m (Straight_Through_Dropout.py:57)
                gated = []
                for c, mv, thr in zip(self.coeffs, self.mask_values,
                                      self.spec.thresholds):
                    m = torch.sigmoid(mv).unsqueeze(0)
                    hard = c * (m >= thr)
                    soft = c * m
                    gated.append((hard - soft).detach() + soft)
            elif self.variational:
                # x * (theta + sigma*xi) (Variational_Dropout_Layer.py:101-112)
                gated = []
                for c, lt, lv, xi in zip(self.coeffs, self.log_thetas,
                                         self.log_var, xi_list):
                    theta = torch.exp(lt)
                    sigma = torch.exp(lv / 2.0)
                    gated.append(c * (theta + sigma * xi).unsqueeze(0))
        restored = gated[0].unsqueeze(0)
        for high, shape in zip(gated[1:], self.spec.level_shapes):
            data = torch.cat([restored.unsqueeze(2), high.unsqueeze(0)], dim=2)
            restored = self.oracle.decode(data, np.asarray(shape))
        return restored[0]

    def forward(self, norm_positions: torch.Tensor, train_gates: bool,
                clamp: bool = False, xi_list=None):
        grid = self.decode(train_gates, xi_list=xi_list)
        g = norm_positions.view(1, 1, 1, -1, 3)
        feats = torch.nn.functional.grid_sample(
            grid.unsqueeze(0), g, mode='bilinear',
            align_corners=False).squeeze(0).squeeze(1).squeeze(1).transpose(0, 1)
        n_freqs = self.spec.n_freqs
        freq = (2.0 ** torch.linspace(0., n_freqs - 1, n_freqs)) * 2 * math.pi
        parts = []
        for fq in freq:
            parts.append(torch.sin(norm_positions * fq))
            parts.append(torch.cos(norm_positions * fq))
        x = torch.cat([norm_positions, torch.cat(parts, -1), feats], -1)
        for w, b in zip(self.ws[:-1], self.bs[:-1]):
            x = x @ w + b
            x = 0.5 * x + torch.sin(x) ** 2
        x = x @ self.ws[-1] + self.bs[-1]
        if clamp:
            x = x.clamp(-1, 1)
        return x

    # --- smallify tracker / bake (Smallify_Dropout.py:94-118, ---------------
    # --- Feature_Grid_Model.py:110-128) --------------------------------------

    def update_tracker(self):
        with torch.no_grad():
            m = self.spec.drop_momentum
            for i, b in enumerate(self.betas):
                phi = torch.sign(b) - self.ema[i]
                self.ema[i] = self.ema[i] + m * phi
                self.ema_var[i] = (1.0 - m) * (self.ema_var[i] + m * phi * phi)

    def bake(self):
        """save_dropvalues_on_grid (Feature_Grid_Model.py:110-128): multiply
        coeffs with gate*mask, freeze d_masks, count discounted zeros."""
        with torch.no_grad():
            if self.drop_type == 'smallify':
                masks = [torch.where(v < t, 1.0, 0.0)
                         for v, t in zip(self.ema_var, self.spec.thresholds)]
                values = [mk * b for mk, b in zip(masks, self.betas)]
                gate_n = sum(b.numel() for b in self.betas)
            elif self.drop_type == 'masked_straight_through':
                masks = [(torch.sigmoid(mv) >= t).float()
                         for mv, t in zip(self.mask_values,
                                          self.spec.thresholds)]
                values = masks        # hard STE value == binary mask
                gate_n = sum(m.numel() for m in self.mask_values)
            elif self.variational:
                masks = []
                for lt, lv, t in zip(self.log_thetas, self.log_var,
                                     self.spec.thresholds):
                    alphas = torch.exp(lv - 2.0 * lt)
                    rates = alphas / (1.0 + alphas)
                    m = torch.where(rates < t, 1.0, 0.0)
                    if torch.count_nonzero(m) == 0:  # keep >= 1 element
                        m.reshape(-1)[0] = 1.0
                    masks.append(m)
                values = [m * torch.exp(lt)
                          for m, lt in zip(masks, self.log_thetas)]
                gate_n = sum(x.numel() for x in self.log_thetas)
            else:
                return None, 0.0
            self.coeffs = [
                (c * v.unsqueeze(0)).clone().requires_grad_(True)
                for c, v in zip(self.coeffs, values)]
            self.d_masks = masks
            zeros = sum(float(c.numel() - torch.count_nonzero(c))
                        for c in self.coeffs)
            return masks, zeros - gate_n / 32.0

    def hard_prune(self):
        with torch.no_grad():
            self.coeffs = [c * m.unsqueeze(0)
                           for c, m in zip(self.coeffs, self.d_masks)]
            self.betas = None
            self.mask_values = None
            self.log_thetas = None
            self.log_var = None
            self.d_masks = None
            self.drop_type = ''


def psnr_full_volume(mirror: TorchMirror, volume: torch.Tensor,
                     batch: int = 65536) -> float:
    """Full-lattice reconstruction PSNR (OutputToVTK.py:53-60 formula)."""
    res = np.asarray(volume.shape)
    max_idx = torch.tensor(res - 1, dtype=torch.float32)
    scales = max_idx / max_idx.max()
    idx = np.stack(np.meshgrid(*[np.arange(n) for n in res],
                               indexing='ij'), -1).reshape(-1, 3)
    se = 0.0
    with torch.no_grad():
        for i in range(0, idx.shape[0], batch):
            chunk = torch.from_numpy(idx[i:i + batch]).float()
            norm = (chunk / max_idx * 2.0 - 1.0) * scales
            pred = mirror.forward(norm, train_gates=True, clamp=True)[:, 0]
            gt = volume.reshape(-1)[i:i + batch]
            se += float(torch.sum((pred - gt) ** 2))
    mse = se / idx.shape[0]
    rng = float(volume.max() - volume.min())
    return 10.0 * math.log10(rng * rng / mse)


def solve_model_torch(mirror: TorchMirror, optimizer, volume: torch.Tensor,
                      cfg, max_pass: float, train_gates: bool,
                      drop_loss: bool, gen: torch.Generator,
                      verbose: bool = False, pos_stream=None,
                      noise_stream=None):
    """Reference solve_model (training/training.py:87-179) with IID integer
    position sampling and the NeurcompDecayStrategy.

    pos_stream: optional iterator yielding (batch_n, 3) int position arrays;
    when given, positions come from it instead of `gen` — used by the
    stream-matched A/B probe (examples/ab_stream_matched.py) to drive the
    mirror with the jax trainer's exact sampling stream."""
    res = np.asarray(volume.shape)
    max_idx = torch.tensor(res - 1, dtype=torch.float32)
    scales = max_idx / max_idx.max()
    n_voxels = int(np.prod(res))
    batch_n = cfg.batch_size * cfg.sample_size
    voxel_seen, volume_passes, step = 0.0, 0.0, 0
    flat = volume.reshape(-1)
    strides = torch.tensor([int(res[1] * res[2]), int(res[2]), 1])
    # reference loop structure: the outer while's budget check only runs when
    # the DataLoader is exhausted — len(loader) = ceil(n_voxels/batch_size)
    # batches (training/training.py:88-89) — while the inner per-step break
    # is int(vp) >= max_pass (training/training.py:178-179)
    loader_len = math.ceil(n_voxels / cfg.batch_size)
    stop = False

    while int(volume_passes) + 1 < max_pass and not stop:
        for _ in range(loader_len):
            step += 1
            if pos_stream is not None:
                pos = torch.from_numpy(np.asarray(next(pos_stream))).long()
            else:
                pos = torch.stack([torch.randint(0, int(r), (batch_n,),
                                                 generator=gen)
                                   for r in res], dim=1)
            norm = (pos.float() / max_idx * 2.0 - 1.0) * scales
            gt = flat[(pos * strides).sum(1)]

            xi_list = None
            if (train_gates and mirror.variational
                    and mirror.d_masks is None):
                if noise_stream is not None:
                    xi_list = next(noise_stream)
                else:
                    xi_list = [torch.randn(tuple(lt.shape), generator=gen)
                               for lt in mirror.log_thetas]

            optimizer.zero_grad()
            pred = mirror.forward(norm, train_gates=train_gates,
                                  xi_list=xi_list)[:, 0]
            # the reference updates the tracker inside the gate forward, i.e.
            # on the PRE-step betas (Smallify_Dropout.py:57-58)
            if (train_gates and mirror.betas is not None
                    and mirror.d_masks is None):
                mirror.update_tracker()

            prior_passes = int(voxel_seen / n_voxels)
            voxel_seen += batch_n
            volume_passes = voxel_seen / n_voxels

            if drop_loss and mirror.variational:
                # VariationalDropoutLoss.forward, ramp included
                # (Variational_Dropout_Layer.py:54-69)
                if mirror.weight_dkl < 30.0:
                    mirror.weight_dkl = mirror.weight_dkl * (
                        1.0 + cfg.weight_dkl_multiplier)
                batch_scale = n_voxels / batch_n
                if mirror.dynamic:
                    # per-sample log-sigma from the jointly-trained
                    # Variance_Model (training/training.py:117-121)
                    log_sigma = mirror.forward_variance(norm)[:, 0]
                else:
                    log_sigma = torch.full_like(pred,
                                                mirror.variational_sigma)
                sq = (gt - pred) ** 2
                sigma = torch.exp(log_sigma)
                a = 1.0 / (2.0 * sigma * sigma)
                b = -(math.log(2.0 * math.pi) + 2.0 * log_sigma) / 2.0
                ll = (a * (-sq) + b).sum() * batch_scale
                dkl = mirror.weight_dkl * mirror.dkl_sum() * batch_scale
                wsum = cfg.lambda_weight_loss * sum(
                    torch.sum(torch.abs(c) ** 2)
                    for c in mirror.coeffs) * batch_scale
                loss = -(ll - dkl - wsum)
            else:
                loss = torch.mean((pred - gt) ** 2)
                gates_l1 = mirror.betas if mirror.betas is not None \
                    else mirror.mask_values
                if drop_loss and gates_l1 is not None:
                    loss = loss + cfg.lambda_drop_loss * sum(
                        torch.abs(b).sum() for b in gates_l1)
                    loss = loss + cfg.lambda_weight_loss * sum(
                        torch.sum(torch.abs(c) ** 2) for c in mirror.coeffs)
            loss.backward()
            optimizer.step()

            # NeurcompDecayStrategy (learning_rate_decay.py:26-31)
            if (prior_passes != int(volume_passes)
                    and (int(volume_passes) + 1) % cfg.pass_decay == 0):
                for group in optimizer.param_groups:
                    group['lr'] *= cfg.lr_decay
            if verbose and step % 100 == 0:
                print(f"torch pass [{volume_passes:.3f}/{max_pass:.1f}] "
                      f"loss {float(loss):.5f}")
            if int(volume_passes) >= max_pass:
                stop = True
                break


def training_torch(spec, params, volume_np: np.ndarray, cfg,
                   seed: int = 0, verbose: bool = False,
                   pos_streams=(None, None), noise_stream=None,
                   var_params=None):
    """Two-phase reference training (training/training.py:184-243) on the
    torch mirror; returns (psnr, zeros)."""
    torch.manual_seed(seed)
    gen = torch.Generator().manual_seed(seed + 1)
    mirror = TorchMirror(spec, params,
                         variational_sigma=getattr(cfg, 'variational_sigma',
                                                   -7.0),
                         var_params=var_params)
    mirror.weight_dkl = cfg.lambda_drop_loss
    volume = torch.from_numpy(volume_np)

    opt = torch.optim.Adam(mirror.parameters(), lr=cfg.lr)
    solve_model_torch(mirror, opt, volume, cfg, cfg.max_pass * (2.0 / 3.0),
                      train_gates=True, drop_loss=bool(spec.drop_type),
                      gen=gen, verbose=verbose, pos_stream=pos_streams[0],
                      noise_stream=noise_stream)
    zeros = 0.0
    if spec.drop_type:
        _, zeros = mirror.bake()
    opt2 = torch.optim.Adam(mirror.parameters(), lr=cfg.lr / 10.0)
    solve_model_torch(mirror, opt2, volume, cfg, cfg.max_pass * (1.0 / 3.0),
                      train_gates=True, drop_loss=False, gen=gen,
                      verbose=verbose, pos_stream=pos_streams[1])
    if spec.drop_type:
        mirror.hard_prune()
    return psnr_full_volume(mirror, volume), zeros
