"""Typed configuration system.

Capability parity: the reference's flat argparse namespace
(``tmglow/args.py``, SURVEY.md L0 / §2 "Config/args") is rebuilt as typed
dataclasses + per-case YAML presets + CLI ``key=value`` overrides,
preserving the reference's case API: one flag selects the case
(backward-step vs cylinder-array) end-to-end (BASELINE.json configs).
"""

from __future__ import annotations

import dataclasses

import pathlib
import typing
from dataclasses import dataclass, field
from typing import Any

import yaml

_CASES_DIR = pathlib.Path(__file__).parent / "cases"


@dataclass(frozen=True)
class ModelConfig:
    """TM-Glow architecture hyperparameters (arXiv:2006.04731 §3)."""

    # Multi-scale Glow structure: L scales, K steps-of-flow per scale.
    n_scales: int = 3
    n_flow_steps: int = 8
    # HF field channels (u, v, p).
    channels: int = 3
    # HF grid (H, W); must be divisible by 2**n_scales.
    hf_shape: tuple[int, int] = (64, 128)
    # LF grid (H, W) — coarse-solver resolution.
    lf_shape: tuple[int, int] = (16, 32)
    # Dense-block coupling network width / depth (paper: DenseNet-style
    # coupling CNNs).
    coupling_width: int = 64
    coupling_layers: int = 3
    growth_rate: int = 32
    # LF conditioning encoder width.
    encoder_width: int = 32
    # Per-scale ConvLSTM hidden channels.
    lstm_hidden: int = 32
    # Conditioning feature channels delivered to coupling/split layers.
    cond_channels: int = 32
    # Matmul/conv dtype for the *networks* (coupling/encoder/LSTM).
    # The invertible flow arithmetic itself is always float32 — nets can
    # run bfloat16 without breaking invertibility because the identical
    # net output is used in forward and inverse directions.
    compute_dtype: str = "bfloat16"
    # Coupling-net conv operand layout. "hwnc" (default, measured 2.3x
    # faster per flow step on v5e): convs see (H, W, N, C) logical
    # operands, keeping channels in the 128 MXU lanes — the flow's
    # small-channel tensors otherwise anchor batch-minor layouts and
    # XLA picks a 3.1x-costlier conv emitter (see flows/coupling.py
    # _HWNCConv). "nhwc" = plain flax path, same parameters/checkpoints.
    conv_layout: str = "hwnc"
    # Layout of EVERY flow-path tensor (x, latents, conds, ConvLSTM
    # state) — flows/layout.py. "hwnc": the whole flow lives in
    # (H, W, N, C) so the hot loops contain no layout transposes at
    # all; round-1 profiling showed the per-coupling hwnc<->nhwc
    # transposes cost ~300 async copies per rollout step (68% of
    # device time). "nhwc": reference-shaped (N, H, W, C) everywhere.
    # Parameters/checkpoints are identical across layouts.
    flow_layout: str = "nhwc"
    # Route the coupling affine+logdet through the Pallas kernel (TPU
    # only). Default False by measurement: after the concat-free net
    # restructure, XLA's own fusion beats the custom call by ~6%
    # device time (1094 vs 1163 ms / 100-step flagship rollout) —
    # the kernel's (B, D) flatten forces layout copies that XLA's
    # in-place fusion avoids. The kernel stays available and tested.
    use_pallas: bool = False
    # Truncate generative latent draws at ±z_clip standard deviations
    # (clipped standard-normal; 0 = off). Tail insurance for high-tau
    # ensemble sampling: OOD latents amplify superexponentially
    # through the reverse coupling stack (1/sigmoid per step), and at
    # tau = 1.0 a large ensemble x long horizon samples the tail often
    # enough to overflow members (measured — docs/PAPER_PARITY.md
    # "Sampling stability"). 4.0 bounds the excursion at negligible
    # distributional cost (P(|eps|>4) ~ 6e-5); training and density
    # evaluation are unaffected (forward logp never samples). NOT an
    # OOD rescue: tau >= 1.15 diverges regardless (bulk OOD).
    # Default 4.0 = the measured preset (both case YAMLs); bare
    # ModelConfig() must reproduce the r3-measured behavior.
    z_clip: float = 4.0

    def validate(self) -> None:
        h, w = self.hf_shape
        div = 2 ** self.n_scales
        if h % div or w % div:
            raise ValueError(
                f"hf_shape {self.hf_shape} must be divisible by 2^{self.n_scales}"
            )
        if self.conv_layout not in ("hwnc", "nhwc"):
            raise ValueError(
                f"conv_layout must be 'hwnc' or 'nhwc', got {self.conv_layout!r}"
            )
        if self.flow_layout not in ("hwnc", "nhwc"):
            raise ValueError(
                f"flow_layout must be 'hwnc' or 'nhwc', got {self.flow_layout!r}"
            )
        if self.flow_layout == "hwnc" and self.conv_layout != "hwnc":
            raise ValueError(
                "flow_layout='hwnc' requires conv_layout='hwnc' (an "
                "nhwc coupling-compute layout would reintroduce the "
                "per-coupling transposes hwnc flow layout removes)"
            )
        if self.flow_layout == "hwnc" and self.use_pallas:
            raise ValueError(
                "use_pallas (fused coupling kernel) currently requires "
                "flow_layout='nhwc' — the kernel consumes member-major "
                "tiles"
            )


@dataclass(frozen=True)
class DataConfig:
    """Dataset locations and windowing (SURVEY.md L1)."""

    data_dir: str = "./datasets"
    case: str = "backward-step"
    # Truncated-BPTT window length (timesteps per gradient segment).
    window: int = 8
    # Trajectory length used for training (timesteps loaded per traj).
    train_steps: int = 64
    n_train_traj: int = 32
    n_test_traj: int = 4
    batch_size: int = 8
    # If true, generate a procedural synthetic dataset (no archives
    # needed — SURVEY.md §7 step 4).
    synthetic: bool = True
    # Synthetic fixture version (data/synthetic.py): 1 = spatial LF
    # degradation only (golden-pinned); 2 = LF is a coarse re-run with
    # growing temporal phase error + spectral truncation — the failure
    # mode TM-Glow exists to correct (arXiv:2006.04731 §1-2's
    # multi-fidelity premise); 3 = v2 plus a broadband HF-only
    # turbulent cascade (E(k) ~ k^-3 between the LF and HF resolution
    # limits, stochastic per mode — genuine conditional uncertainty at
    # high k; VERDICT r3 item 3). v3 is the DEFAULT posture (VERDICT
    # r4 item 3): it was validated by converged runs on BOTH cases in
    # round 4 (runs/r4_v3, runs/r4_v3cyl), and the r4 diagnosis showed
    # v2's TKE-window inversion and cylinder spectrum loss were
    # substantially fixture artifacts of its streamfunction-smooth HF.
    # The golden pins (tests/test_golden.py) call the generator with
    # an explicit version and stay on v1; the committed v2-era run
    # evals pin fixture_version=2 explicitly. Ignored for real
    # archives.
    fixture_version: int = 3
    # Training-split loading strategy: "ram" loads the whole archive
    # (reference behaviour); "stream" serves trajectory batches from a
    # .tpf store via the native C++ loader with fused normalization
    # and async prefetch (host RAM O(batch)) — see tpuflow/data/tpf.py.
    loader: str = "ram"
    # Keep the whole (RAM-loaded) training split resident on device and
    # gather batches on-device by index: replaces per-batch
    # host->device uploads with a B*8-byte index transfer (measured
    # 4.5 -> 13.0 windows/s on v5e via tunnel — near the ~14.5
    # device-bound ceiling). Auto-disabled for streaming datasets or
    # when the split exceeds device_resident_max_gb per device.
    device_resident: bool = True
    device_resident_max_gb: float = 4.0
    # Physical domain extents (x, y) of the structured grid; both
    # shipped cases use a 4x1 domain. Sets the grid spacings used by
    # spatial-derivative statistics (vorticity) — on anisotropic grids
    # unit spacing would mis-weight the dv/dx vs du/dy terms.
    domain_x: float = 4.0
    domain_y: float = 1.0
    seed: int = 0


@dataclass(frozen=True)
class TrainConfig:
    epochs: int = 100
    # lr/grad_clip are the fixture-v3-stable posture measured in r4
    # (runs/r4_v3 supervisor evidence): the r3 preset (lr 1e-3, clip
    # 1000) NaN'd at epoch 81 on the rougher broadband-cascade
    # landscape; lr 5e-4 + clip 100 converged 400 epochs on BOTH cases
    # with no restarts. Historical context for the clip value: clip=10
    # saturated 50-110x late in r2 training (every update
    # direction-only) — the clip must stay well above typical late
    # grad norms, and 100 does on v3 (r4 logs). Defaults match the
    # case presets so programmatic TrainConfig() reproduces the
    # measured behavior (VERDICT r3 weak #2).
    lr: float = 5e-4
    lr_decay: float = 0.995
    weight_decay: float = 0.0
    grad_clip: float = 100.0
    # Rematerialize per-timestep activations inside the BPTT window to
    # bound HBM (SURVEY.md §7 hard part 3). Default off by measurement:
    # at the production configs (batch 8 x window 8, 64x128 grid) the
    # window's activations fit v5e HBM comfortably and remat's forward
    # recompute cost ~3.3x training wall time (1.4 -> 4.75 windows/s
    # measured on-chip) plus minutes of extra XLA compile. Re-enable
    # for configs whose window activations exceed HBM.
    remat: bool = False
    # Scan all BPTT windows of a trajectory batch inside one jit (one
    # dispatch per batch instead of per window — identical update
    # sequence, higher throughput). Disable for per-window logging.
    fused_windows: bool = True
    checkpoint_dir: str = "./checkpoints"
    checkpoint_every: int = 10
    # Save a sample-vs-target figure every N epochs (0 = off) — the
    # reference's periodic sample+plot during training (SURVEY.md §3.1).
    plot_every: int = 0
    # Compute held-out (test-split) NLL every N epochs (0 = off) and
    # append it to val_log.csv next to train_log.csv — the paper's
    # train/validation monitoring; the test split reuses the TRAIN
    # normalization constants, same as evaluation.
    eval_every: int = 0
    # Log a metrics row every N global steps (0 = off).
    log_every: int = 10
    seed: int = 42
    # Mesh axis sizes; -1 on data means "all remaining devices".
    mesh_data: int = -1
    mesh_ensemble: int = 1
    # Abort with a traceback on the first NaN anywhere in the step
    # (jax_debug_nans — the TPU-native sanitizer, SURVEY.md §5).
    debug_nans: bool = False
    # jax.profiler trace directory ("" = off); view in TensorBoard or
    # ui.perfetto.dev (SURVEY.md §5 tracing row).
    trace_dir: str = ""
    # TensorBoard scalar-summary directory ("" = CSV/stdout only).
    tensorboard_dir: str = ""


@dataclass(frozen=True)
class EvalConfig:
    n_samples: int = 64           # UQ ensemble size (BASELINE config #4)
    rollout_steps: int = 100      # autoregressive horizon (config #1)
    # Sampling temperature tau (paper §4). 0.85 dominates 0.7 on
    # TKE + CRPS with flat field error (runs/r3_tau sweep); default
    # matches the measured case presets.
    temperature: float = 0.85
    # Per-scale sampling temperatures "t0,t1,t2" (scale 0 = the finest
    # split — models/glow.py reverse). "" = use the scalar
    # `temperature`, unless the checkpoint carries a fine-tuned
    # "learned_tau" in its meta (eval/loading.resolve_temperature
    # priority: this override > learned_tau > scalar).
    temperature_scales: str = ""
    output_dir: str = "./eval_out"
    # jax.profiler trace directory for the rollout ("" = off).
    trace_dir: str = ""
    # Exact-calibration horizon: a fields-mode rollout of this many
    # steps on the first test trajectory feeds ensemble CRPS, interval
    # coverage, and energy spectra (0 = skip; memory is O(T*N*H*W*C)).
    calibration_steps: int = 32
    # Post-hoc UQ spread inflation (eval/calibrate.py): rollout stats
    # report var * spread_scale**2. Fit with cli/evaluate.py (the
    # "spread_scale" metric); 1.0 = raw ensemble dispersion.
    spread_scale: float = 1.0
    # Per-location inflation FIELD: path to the spread_field.npy that
    # cli/evaluate.py saves ((H, W, C) factors; calibrate.py
    # fit_spread_field_from_z). When set, deployed variance surfaces
    # use var * field**2 (overrides the scalar). "" = off.
    spread_field: str = ""
    # Reference horizon for VARIANCE-derived statistics (TKE, Reynolds
    # stress, fluctuation PDFs) on SYNTHETIC data: when > the rollout
    # horizon, the generator extends each test trajectory to this many
    # steps and references use the converged temporal statistics.
    # Measured motivation (.verify_tke_floor.py): a 32-step temporal
    # variance carries 0.34 rel-L2 of pure sampling noise, and fixture
    # v2's LF is phase-correlated with HF, so a short-window reference
    # credits the bicubic baseline for matching the reference's NOISE
    # REALIZATION — which no ensemble estimate can do. Converged
    # references score the statistic itself (BASELINE config #4).
    # 0 = use the rollout horizon. Ignored for real archives.
    ref_steps: int = 0
    # Trajectories per batched-rollout dispatch in cli/evaluate.py —
    # bounds peak activation memory at traj_batch * n_samples members.
    traj_batch: int = 4
    # Member-level overflow recovery in rollouts (eval/rollout.py):
    # redraw failed ensemble members once at 0.6x temperature, then
    # zero-fill. Needed for dispersion-fine-tuned (widened) samplers
    # whose rare draws exceed the decoder's validity envelope; the
    # unfailed fast path costs nothing (scalar lax.cond), but under
    # the BATCHED trajectory rollout vmap executes both cond branches,
    # so default off.
    overflow_redraw: bool = False
    # Evaluating with NO checkpoint is an error by default: a typo'd
    # checkpoint_dir would otherwise silently evaluate an untrained
    # model and emit a complete, plausible-looking eval_metrics.json.
    # Set true only for explicit untrained smoke rollouts.
    allow_untrained: bool = False


@dataclass(frozen=True)
class FinetuneConfig:
    """Sample-path fine-tuning knobs (train/finetune.py): dispersion +
    spectral-shape objectives evaluated on generative draws, starting
    from a converged NLL checkpoint (VERDICT r3 items 1-2)."""

    epochs: int = 8
    # Generative draws per trajectory per timestep (folded into the
    # batch axis of one reverse pass — models/tmglow.py
    # nll_and_sample_step).
    n_members: int = 6
    # Trajectories per fine-tune batch (smaller than training: the
    # sample branch multiplies the effective batch by n_members).
    batch_size: int = 4
    # Fair-ensemble-CRPS weight (dispersion in the loop; 0 = off).
    lambda_crps: float = 0.0
    # Member-fluctuation log-spectrum MSE weight (0 = off).
    lambda_spec: float = 0.0
    # Spread-skill (variance-matching) weight: per-pixel log-MSE of
    # fair ensemble variance vs squared ensemble-mean error — the one
    # dispersion signal window temporal variation cannot fake (0 = off).
    lambda_disp: float = 0.0
    lr: float = 1e-4
    grad_clip: float = 1000.0
    # Optimize a per-scale log sampling temperature jointly with the
    # parameters; deployed via checkpoint meta "learned_tau".
    learn_tau: bool = True
    # Which parameters may move: "all"; "nets" (all except the
    # exponentially-sensitive actnorm/inv1x1 flow-arithmetic params —
    # the stable full-capacity scope); or "priors" (only the
    # conditional-prior nets — dispersion reallocation with the decode
    # map frozen; see train/finetune._scope_mask).
    train_scope: str = "all"
    remat: bool = False
    # Source checkpoint directory ("" = train.checkpoint_dir). The
    # fine-tuned checkpoint saves to checkpoint_dir ("" = source +
    # "_ft"), never overwriting the source run.
    source_dir: str = ""
    checkpoint_dir: str = ""
    seed: int = 7
    # Overflow guard (measured r5: fine-tuning the 800-epoch
    # backward-step checkpoint ran 6 healthy epochs — bpd −9.61→−9.64,
    # dispersion improving — while the skipped-window count climbed
    # 8→36 of 64, then collapsed to bpd −2.4 in one epoch; the r4
    # "watch the skipped_windows column" rule, automated). An epoch is
    # HEALTHY iff its skipped-window fraction <= max_skipped_frac AND
    # its bpd has not risen more than max_bpd_rise above the best
    # healthy bpd. Healthy epochs snapshot the parameters to host;
    # the SAVED checkpoint is the last healthy snapshot, not the final
    # epoch. With early_stop, two consecutive unhealthy epochs (or a
    # catastrophic bpd rise) abort the run instead of burning chip
    # time past the boundary.
    max_skipped_frac: float = 0.4
    max_bpd_rise: float = 0.5
    early_stop: bool = True


@dataclass(frozen=True)
class CaseConfig:
    name: str = "backward-step"
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    eval: EvalConfig = field(default_factory=EvalConfig)
    finetune: FinetuneConfig = field(default_factory=FinetuneConfig)

    def validate(self) -> None:
        self.model.validate()


def _from_dict(cls, d: dict[str, Any]):
    known = {f.name for f in dataclasses.fields(cls)}
    unknown = set(d) - known
    if unknown:
        raise KeyError(
            f"unknown {cls.__name__} keys {sorted(unknown)}; "
            f"valid keys: {sorted(known)}"
        )
    # Resolve *string* annotations (this module uses `from __future__
    # import annotations`, so f.type is a str and
    # dataclasses.is_dataclass(f.type) would always be False) to find
    # nested dataclass fields robustly — a newly added nested config
    # converts automatically instead of silently staying a raw dict.
    hints = typing.get_type_hints(cls)
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in d:
            continue
        v = d[f.name]
        ftype = hints.get(f.name, f.type)
        if dataclasses.is_dataclass(ftype) and isinstance(v, dict):
            v = _from_dict(ftype, v)
        elif isinstance(v, list):
            v = tuple(v)
        kwargs[f.name] = v
    return cls(**kwargs)


def _apply_overrides(cfg: CaseConfig, overrides: dict[str, Any]) -> CaseConfig:
    """Apply dotted-path overrides, e.g. {"model.n_scales": 2}."""
    d = dataclasses.asdict(cfg)
    for key, val in overrides.items():
        parts = key.split(".")
        node = d
        for p in parts[:-1]:
            node = node[p]
        if parts[-1] not in node:
            raise KeyError(f"unknown config key: {key}")
        old = node[parts[-1]]
        if isinstance(old, bool):
            if not isinstance(val, bool):
                s = str(val).lower()
                if s in ("1", "true", "yes", "on"):
                    val = True
                elif s in ("0", "false", "no", "off"):
                    val = False
                else:
                    raise ValueError(
                        f"boolean override {key}={val!r} not understood "
                        "(use true/false)"
                    )
        elif isinstance(old, int):
            val = int(val)
        elif isinstance(old, float):
            val = float(val)
        elif isinstance(old, (tuple, list)):
            if isinstance(val, str):
                val = tuple(int(x) for x in val.strip("()[] ").split(","))
            else:
                val = tuple(val)
        node[parts[-1]] = val
    return _from_dict(CaseConfig, d)


def case_names() -> list[str]:
    return sorted(p.stem for p in _CASES_DIR.glob("*.yaml"))


def load_case(name_or_path: str, overrides: dict[str, Any] | None = None) -> CaseConfig:
    """Load a case preset YAML (by name or path) with optional overrides."""
    path = pathlib.Path(name_or_path)
    if not path.exists():
        path = _CASES_DIR / f"{name_or_path}.yaml"
    if not path.exists():
        raise FileNotFoundError(
            f"no case config {name_or_path!r}; known cases: {case_names()}"
        )
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    cfg = _from_dict(CaseConfig, raw)
    if overrides:
        cfg = _apply_overrides(cfg, overrides)
    cfg.validate()
    return cfg


def parse_cli_overrides(argv: list[str]) -> dict[str, Any]:
    """Parse trailing ``key=value`` CLI arguments into an override dict."""
    out: dict[str, Any] = {}
    for arg in argv:
        if "=" not in arg:
            raise ValueError(f"override must be key=value, got {arg!r}")
        k, v = arg.split("=", 1)
        out[k] = v
    return out
