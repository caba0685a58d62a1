"""Typed configs + preset registry + `key=value` CLI overrides.

Replaces the reference's per-script argparse/absl flags (SURVEY.md §2.1 #11)
with one registry of named presets matching the five BASELINE.json configs.
The fully resolved config is serialised into every checkpoint and metrics
file (SURVEY.md §5).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any

from gnfx.models.flow import FlowConfig


@dataclasses.dataclass(frozen=True)
class DataConfig:
    dataset: str = "community-small"
    seed: int = 1234
    num_graphs: int | None = None   # None -> dataset default
    batch_size: int = 32


@dataclasses.dataclass(frozen=True)
class AEConfig:
    """Graph auto-encoder (SURVEY.md §2.1 #5)."""
    embed_dim: int = 14             # node embedding dim == flow node_dim
    feature_dim: int = 14           # random input features fed to the encoder
    gnn_hidden: int = 64
    gnn_rounds: int = 3
    aggregation: str = "mean"
    message_mode: str = "sender"
    decoder_c: float = 10.0         # sharpness C in sigmoid(C(1 - d²))
    # "dist": the reference's pure pairwise-distance decoder (SURVEY.md §2.3).
    # "mlp": distance logit + a learned symmetric pair MLP correction
    # (zero-initialised, so it starts exactly at the dist decoder). The MLP
    # sees permutation-symmetric pair features [x_u + x_v, (x_u − x_v)²] and
    # lowers the reconstruction ceiling (BASELINE.md: the AE ceiling, not the
    # flow, binds community-small quality).
    decoder: str = "dist"
    decoder_hidden: int = 64
    # Stage-1→2 handoff canonicalization (see ae.canonicalize_embeddings):
    # the distance decoder is rigid-motion-invariant, so per-graph cloud
    # mean/orientation are pure nuisance dims. "center" removes the mean;
    # "pca" also rotates onto principal axes (skew-fixed reflections) —
    # with `canon_jitter` isotropic noise keeping the training density proper.
    canonicalize: str = "none"
    canon_jitter: float = 0.05
    train_steps: int = 3000
    lr: float = 1e-3
    pos_weight: float = 2.0         # BCE class weight on edges (sparse graphs)
    # Bridge-aware reconstruction (round-10 diagnosis: the distance decoder
    # drops a graph's LONGEST true-edge distances first — exactly the
    # inter-community bridges — so the AE roundtrip of real community
    # graphs was only 48% connected). >0 multiplies each true edge's BCE
    # weight by 1 + bridge_weight·relu(d²_uv/mean_pos_d² − 1), focusing
    # training on the longest (most at-risk) edges. Distances are
    # stop-gradiented: the boost re-weights the loss, it is not a term the
    # encoder can game by shrinking distances.
    bridge_weight: float = 0.0
    # How at-risk edges are identified (only used when bridge_weight > 0):
    # "dist" — relative embedding distance (adaptive; also catches long
    #          within-community edges, which measured as ceiling-harmful);
    # "tri"  — true edges that are in NO triangle (common-neighbor count
    #          from one A@A matmul). In community-like graphs these are
    #          exactly the inter-community bridges; static, graph-exact,
    #          and available from step 0.
    bridge_mode: str = "dist"


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    num_steps: int = 5000
    # optimizer steps per jit dispatch (lax.scan over stacked batch chunks).
    # Tiny graph batches are dispatch-latency-bound, not compute-bound;
    # scanning K steps per call amortises per-call overhead with bit-identical
    # per-step semantics (same keys, data order, schedule counts). Use 1 to
    # dispatch every step individually; lower for very large graphs where the
    # stacked chunk's host->device transfer would dominate.
    steps_per_call: int = 32
    lr: float = 1e-3
    lr_warmup: int = 100
    grad_clip: float = 10.0
    weight_decay: float = 0.0
    seed: int = 0
    log_every: int = 100
    checkpoint_every: int = 1000
    checkpoint_dir: str = "checkpoints"
    checkpoint_keep: int = 3        # retained checkpoints (long quality runs
                                    # keep many, enabling best-step selection
                                    # from the quality-probe trajectory)
    eval_every: int = 1000
    # >0: at every eval, sample this many graphs and log degree/clustering
    # MMD vs the held-out split (generation-quality trajectory, not just NLL)
    eval_samples: int = 0
    # >0: profile this many training chunks (starting at the SECOND chunk,
    # so compile noise stays out) into <run_dir>/trace with
    # jax.profiler.trace — open in Perfetto / TensorBoard to see real
    # device occupancy vs host gaps (the MFU question, round-2 verdict).
    trace_chunks: int = 0
    # >0: maintain an exponential moving average of the flow params (decay
    # per optimizer step, updated inside the scan chunk). The EMA params are
    # checkpointed ALONGSIDE the raw params — (params, opt_state, ema) — so
    # post-hoc selection (scripts/stepsweep.py) can compare raw vs EMA per
    # checkpoint; sampling/eval during training use the EMA when enabled.
    ema_decay: float = 0.0
    # >0: git-commit the run's latest checkpoint + metrics at checkpoint
    # cadence, throttled to this many seconds between commits (failure
    # recovery: only committed files survive this box's reimages — the
    # round-3 deep24 result was lost to an end-of-job-only commit policy).
    # Long-run job templates set 900; 0 keeps short runs commit-free.
    git_commit_s: float = 0.0


@dataclasses.dataclass(frozen=True)
class DistConfig:
    """Device-mesh layout (SURVEY.md §2.2). data axis shards graph batches;
    model axis is exposed for TP of MLP weights but defaults to 1."""
    data_axis: int = -1             # -1 -> all available devices
    model_axis: int = 1


@dataclasses.dataclass(frozen=True)
class ExperimentConfig:
    name: str = "experiment"
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    flow: FlowConfig = dataclasses.field(default_factory=lambda: FlowConfig(node_dim=14))
    ae: AEConfig = dataclasses.field(default_factory=AEConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    dist: DistConfig = dataclasses.field(default_factory=DistConfig)


def _preset(name, **kw) -> ExperimentConfig:
    return ExperimentConfig(name=name, **kw)


# The five BASELINE.json configs (SURVEY.md §6) + a tiny CI smoke preset.
PRESETS: dict[str, ExperimentConfig] = {
    "community-small": _preset(
        "community-small",
        data=DataConfig(dataset="community-small", batch_size=32),
        # scan_unroll=12 (full coupling-stack unroll): measured 1.55x device
        # steps/s at exactly this shape (runs/unroll_flagship.json, 519 vs
        # 335) — tiny-graph training is op-dispatch-bound on device and the
        # unroll lets XLA fuse across couplings. Pure compile knob, same math.
        flow=FlowConfig(node_dim=20, num_couplings=12, gnn_hidden=128,
                        gnn_rounds=3, message_mode="attention",
                        use_actnorm=True, scan_unroll=12),
        # AE settings from the reconstruction-ceiling sweep (see BASELINE.md):
        # sharper decoder + wider embeddings + longer training drop the
        # encode->decode MMD ceiling from 0.12/0.36/0.13 to ~0.05/0.12/0.05
        ae=AEConfig(embed_dim=20, feature_dim=20, gnn_hidden=128, gnn_rounds=4,
                    decoder_c=50.0, train_steps=20000, pos_weight=1.0),
        train=TrainConfig(num_steps=200000, lr=7e-4, log_every=2000,
                          checkpoint_every=20000, eval_every=20000,
                          eval_samples=64, checkpoint_keep=100),
    ),
    "ego-small": _preset(
        "ego-small",
        data=DataConfig(dataset="ego-small", batch_size=32),
        flow=FlowConfig(node_dim=20, num_couplings=12, gnn_hidden=128,
                        gnn_rounds=3, message_mode="attention",
                        use_actnorm=True, scan_unroll=12),
        ae=AEConfig(embed_dim=20, feature_dim=20, gnn_hidden=128, gnn_rounds=4,
                    decoder_c=50.0, train_steps=20000, pos_weight=1.0),
        train=TrainConfig(num_steps=200000, lr=7e-4, log_every=2000,
                          checkpoint_every=20000, eval_every=20000,
                          eval_samples=64, checkpoint_keep=100),
    ),
    "grid": _preset(
        "grid",
        data=DataConfig(dataset="grid", batch_size=32),
        flow=FlowConfig(node_dim=20, num_couplings=12, gnn_hidden=128,
                        gnn_rounds=3, message_mode="attention",
                        use_actnorm=True, scan_unroll=12),
        ae=AEConfig(embed_dim=20, feature_dim=20, gnn_hidden=128, gnn_rounds=4,
                    decoder_c=50.0, train_steps=20000, pos_weight=1.0),
        train=TrainConfig(num_steps=200000, lr=7e-4, log_every=2000,
                          checkpoint_every=20000, eval_every=20000,
                          eval_samples=64, checkpoint_keep=100,
                          ema_decay=0.9999),
    ),
    "protein": _preset(
        "protein",
        data=DataConfig(dataset="protein", batch_size=8),
        flow=FlowConfig(
            node_dim=14, num_couplings=12, gnn_hidden=128, gnn_rounds=3,
            message_mode="attention", use_actnorm=True,
            compute_dtype="bfloat16",
        ),
        ae=AEConfig(embed_dim=14, feature_dim=14, train_steps=5000),
        train=TrainConfig(num_steps=5000, steps_per_call=4, eval_samples=16),
    ),
    # The round-3 "protein for real" config (round-2 verdict missing #1):
    # the 5k-step protein-v1 smoke used embed 14 / c=10 / canonicalize=none
    # while every proven-quality dataset runs embed 20 / sharp decoder /
    # pca. The AE stays narrow (hidden 64, the v1 size) because at N=512
    # stage-1 cost is real; decoder_c is set from the measured quick-ceiling
    # sweep (runs/protein_ae_sweep.json, tools/jobs/105).
    "protein-pca": _preset(
        "protein-pca",
        data=DataConfig(dataset="protein", batch_size=8),
        flow=FlowConfig(
            node_dim=20, num_couplings=12, gnn_hidden=128, gnn_rounds=3,
            message_mode="attention", use_actnorm=True,
            compute_dtype="bfloat16",
        ),
        ae=AEConfig(embed_dim=20, feature_dim=20, decoder_c=50.0,
                    canonicalize="pca", train_steps=15000),
        train=TrainConfig(num_steps=60000, steps_per_call=4, lr=7e-4,
                          log_every=500, checkpoint_every=4000,
                          checkpoint_keep=100, eval_every=4000,
                          eval_samples=16),
    ),
    "smoke": _preset(
        "smoke",
        data=DataConfig(dataset="community-small", batch_size=8, num_graphs=40),
        flow=FlowConfig(node_dim=6, num_couplings=3, gnn_hidden=16, gnn_rounds=2),
        ae=AEConfig(embed_dim=6, feature_dim=6, gnn_hidden=16, gnn_rounds=2,
                    train_steps=200),
        train=TrainConfig(num_steps=200, log_every=50, checkpoint_every=100,
                          eval_every=100),
    ),
}


def _pca_winner(base: str) -> ExperimentConfig:
    """The measured flagship recipe (rounds 6-10, BASELINE.md "Current
    measured"): pca canonicalization of the AE embeddings + 400k flow steps
    at 256-step chunked dispatch. Until round 3 these existed only as
    override stacks in tools/jobs/*, so `train_gnf.py community-small`
    reproduced a superseded (round-6 losing) recipe; these presets make the
    winners the zero-override path."""
    b = PRESETS[base]
    return dataclasses.replace(
        b,
        name=f"{base}-pca",
        ae=dataclasses.replace(b.ae, canonicalize="pca"),
        train=dataclasses.replace(b.train, num_steps=400000,
                                  steps_per_call=256),
    )


for _b in ("community-small", "ego-small", "grid"):
    PRESETS[f"{_b}-pca"] = _pca_winner(_b)


# ---------------------------------------------------------------------------
# (de)serialisation + CLI overrides
# ---------------------------------------------------------------------------

def from_dict(d: dict) -> ExperimentConfig:
    """Inverse of `to_dict` — rebuild a config from a run's config.json."""
    return ExperimentConfig(
        name=d["name"],
        data=DataConfig(**d["data"]),
        flow=FlowConfig(**d["flow"]),
        ae=AEConfig(**d["ae"]),
        train=TrainConfig(**d["train"]),
        dist=DistConfig(**d["dist"]),
    )


def to_dict(cfg: Any) -> Any:
    if dataclasses.is_dataclass(cfg):
        return {f.name: to_dict(getattr(cfg, f.name)) for f in dataclasses.fields(cfg)}
    return cfg


def to_json(cfg: ExperimentConfig) -> str:
    return json.dumps(to_dict(cfg), indent=2, sort_keys=True)


def _coerce(value: str, current: Any) -> Any:
    if isinstance(current, bool):
        return value.lower() in ("1", "true", "yes")
    if isinstance(current, int):
        return int(value)
    if isinstance(current, float):
        return float(value)
    if current is None:
        try:
            return int(value)
        except ValueError:
            return value
    return value


def apply_overrides(cfg: ExperimentConfig, overrides: list[str]) -> ExperimentConfig:
    """Apply `section.field=value` (or `name=value`) strings to a config."""
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"override {ov!r} is not key=value")
        key, value = ov.split("=", 1)
        parts = key.split(".")
        if len(parts) == 1:
            current = getattr(cfg, parts[0])
            cfg = dataclasses.replace(cfg, **{parts[0]: _coerce(value, current)})
        elif len(parts) == 2:
            section = getattr(cfg, parts[0])
            current = getattr(section, parts[1])
            new_section = dataclasses.replace(
                section, **{parts[1]: _coerce(value, current)}
            )
            cfg = dataclasses.replace(cfg, **{parts[0]: new_section})
        else:
            raise ValueError(f"override key {key!r} nests too deep")
    return cfg


def load_config(argv: list[str]) -> ExperimentConfig:
    """CLI entry: first bare token or `preset=` picks the preset, the rest
    are overrides. Example: `community-small train.num_steps=2000`."""
    preset = "community-small"
    overrides = []
    for a in argv:
        if "=" not in a:
            preset = a
        elif a.startswith("preset="):
            preset = a.split("=", 1)[1]
        else:
            overrides.append(a)
    if preset not in PRESETS:
        raise KeyError(f"unknown preset {preset!r}; have {sorted(PRESETS)}")
    return apply_overrides(PRESETS[preset], overrides)
