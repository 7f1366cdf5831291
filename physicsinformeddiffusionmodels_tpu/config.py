"""Run configuration.

Single dataclass capturing BOTH the reference's `model.yaml` keys
(`/root/reference/model.yaml:1-13`) and the per-study constants hard-coded in
its driver (`main.py:48-109`): batch sizes, iteration budgets, eval
frequencies, model dims. Serialized with every checkpoint.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Optional


@dataclasses.dataclass
class RunConfig:
    # --- model.yaml keys ---
    c_data: float = 1.0
    c_residual: float = 1e-3
    c_ineq: float = 0.0
    lambda_opt: float = 0.0
    diff_steps: int = 100
    x0_estimation: str = "mean"  # 'mean' | 'sample'
    ddim_steps: int = 0
    residual_grad_guidance: bool = False
    correction_mode: str = "none"  # 'x0' | 'xt' | 'none'
    M_correction: int = 0
    N_correction: int = 0
    gov_eqs: str = "darcy"  # 'darcy' | 'mechanics'
    fd_acc: int = 2  # must match the training data

    # --- study constants (main.py:48-109) ---
    name: str = "run_1"
    pixels_per_dim: int = 64
    pixels_at_boundary: bool = True
    domain_length: float = 1.0
    reverse_d1: bool = True
    bcs: str = "none"  # 'none' | 'periodic'
    train_iterations: int = 300_000
    train_batch_size: Optional[int] = None  # default depends on study/estimation
    lr: float = 1e-4
    # 'constant' matches the reference recipe (`main.py:143,165`: Adam 1e-4,
    # no decay). 'cosine' decays lr -> lr_final_frac*lr over train_iterations;
    # an opt-in lever against the measured late-training sampled-residual
    # degradation (results/darcy_300k: 2.8e-2 at 40k -> 7.8e-2 at 300k).
    lr_schedule: str = "constant"  # 'constant' | 'cosine'
    lr_final_frac: float = 0.1
    grad_clip: float = 1.0
    ema_decay: float = 0.99
    ema_start: int = 1000
    test_eval_freq: int = 500
    sample_freq: int = 20_000
    log_freq: int = 20
    # >1: advance this many optimizer steps per device dispatch (lax.scan in
    # make_chunked_resident_step) — amortises per-step host→device RPC latency
    # on tunneled TPUs; bit-identical stepping (keys/EMA derive from
    # state.step). All log/eval/sample freqs must be multiples of it.
    chunk_steps: int = 1
    no_samples: int = 8
    seed: int = 0
    use_double: bool = False
    use_dynamic_threshold: bool = False
    self_condition: bool = False
    topopt_eval: bool = True
    guidance_scale: float = 3.0
    null_cond_prob: float = 0.1
    # resume from the latest checkpoint under <output_dir>/<name>/model
    # (reference: load_model_flag, `main.py:16-21`; here the checkpoint also
    # restores EMA/optimizer/step so a preempted run continues exactly)
    resume: bool = False

    # --- model dims (main.py:122-128) ---
    unet_dim: Optional[int] = None  # darcy 32, mechanics 128
    # frame-attention path (net-new live layer; the reference constructs
    # temporal attention but never invokes it — imported reference
    # checkpoints set this False, scripts/import_reference_checkpoint.py)
    frame_attention: bool = True
    # --- data paths ---
    data_dir: str = "./data/darcy/train"
    valid_data_dir: str = "./data/darcy/valid"
    output_dir: str = "./trained_models"
    # --- parallelism ---
    mesh_dp: Optional[int] = None  # default: all devices
    mesh_tp: int = 1
    # >1 adds a leading 'slice' mesh axis: data parallelism across TPU
    # slices whose gradient all-reduce rides DCN (parallel.mesh docstring)
    mesh_slices: int = 1
    # with mesh_tp > 1: shard wide-stage activation channels over 'tp'
    # (UNet.tp_mesh) so GSPMD keeps the conv chain partitioned
    tp_shard_activations: bool = False
    # with mesh_tp > 1: run linear attention sequence-parallel over 'tp'
    # (UNet.sp_mesh) — scales attention past single-chip memory at >64^2
    seq_parallel_attn: bool = False
    # --- compute dtype ('float32' | 'bfloat16' for model compute) ---
    # bfloat16 activations/convs with float32 params & loss — the TPU-native
    # default (MXU-rate matmuls, half the HBM traffic). float32 available
    # for strict-numerics comparison runs.
    compute_dtype: str = "bfloat16"
    # with bfloat16 compute: run the UNet's final block + 1x1 conv in fp32
    # so the x0 prediction keeps fp32 granularity — the FD residual term
    # amplifies bf16 output quantization noise by ~1/d0^2, which corrupts
    # the residual gradient late in training (docs/DARCY_DRIFT.md)
    fp32_head: bool = False

    def __post_init__(self):
        if self.residual_grad_guidance and self.gov_eqs != "darcy":
            # reference parity: guidance via the residual gradient is only
            # implemented for the Darcy study (`/root/reference/main.py:47-48`)
            raise ValueError(
                "residual_grad_guidance is currently only implemented for "
                f"gov_eqs='darcy' (got gov_eqs='{self.gov_eqs}')."
            )
        use_ddim = self.x0_estimation == "sample"
        if self.train_batch_size is None:
            if self.gov_eqs == "darcy":
                self.train_batch_size = 16 if use_ddim else 64
            else:
                self.train_batch_size = 4 if use_ddim else 6
        if self.unet_dim is None:
            self.unet_dim = 32 if self.gov_eqs == "darcy" else 128
        # NOTE: the mechanics study's 600k-iteration default
        # (`/root/reference/main.py:102-109`) lives in train_mechanics.py's
        # argparse default — rewriting it here would silently turn an
        # explicit `--iterations 300000` into 600k.

    def validate_chunking(self):
        """With chunk_steps > 1, every periodic event must land on a chunk
        end, or the driver loop would silently skip it mid-chunk."""
        if self.chunk_steps <= 1:
            return
        for name in ("log_freq", "test_eval_freq", "sample_freq"):
            v = getattr(self, name)
            if v % self.chunk_steps != 0:
                raise ValueError(
                    f"{name}={v} must be a multiple of chunk_steps={self.chunk_steps}"
                )

    @property
    def use_ddim_x0(self) -> bool:
        return self.x0_estimation == "sample"

    @property
    def output_channels(self) -> int:
        return 2 if self.gov_eqs == "darcy" else 3

    @property
    def model_channels(self) -> int:
        # mechanics model sees 3 noisy fields + 3 conditioning + 4 BC/load
        return 2 if self.gov_eqs == "darcy" else 10

    @property
    def sigmoid_last_channel(self) -> bool:
        return self.gov_eqs == "mechanics"

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @classmethod
    def from_json(cls, text: str) -> "RunConfig":
        return cls(**json.loads(text))

    def save(self, path):
        Path(path).write_text(self.to_json())

    @classmethod
    def load(cls, path) -> "RunConfig":
        return cls.from_json(Path(path).read_text())

    @classmethod
    def from_model_yaml(cls, path, **overrides) -> "RunConfig":
        """Load a reference-format ``model.yaml`` (`model.yaml:1-13`) —
        its 13 keys map 1:1 onto the corresponding fields here, so runs
        configured for the reference work unchanged."""
        import yaml

        raw = yaml.safe_load(Path(path).read_text())
        fields = {f.name for f in dataclasses.fields(cls)}
        unknown = set(raw) - fields
        if unknown:
            raise ValueError(f"unknown model.yaml keys: {sorted(unknown)}")
        if raw.get("correction_mode") is not None:
            raw["correction_mode"] = str(raw["correction_mode"])
        return cls(**{**raw, **overrides})
