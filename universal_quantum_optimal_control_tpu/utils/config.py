r"""Config loading — reference-JSON-compatible plus full run configs.

``load_model_params`` accepts the reference's per-workload
``model_params.json`` format unchanged (tuple-izing pulse-space ranges —
reference SCORE.py:260-269), so existing configs (e.g.
train/unitary_single_qubit_gate/model_params.json, demo params JSONs) work
as-is.  ``RunConfig`` additionally captures everything the reference hardcodes
in ``main()`` (curriculum list, batch size, MC count, Adam lr, seed —
SCORE.py:304-332) in one serializable object with CLI overrides.
"""

from __future__ import annotations

import dataclasses
import json

from typing import Any, Dict, List, Optional

from ..training.trainer import CurriculumBand, TrainConfig

__all__ = ["load_model_params", "RunConfig", "load_run_config"]


def load_model_params(json_path: str) -> Dict[str, Any]:
    """Reference-compatible model-params loader (SCORE.py:260-269)."""
    with open(json_path) as f:
        params = json.load(f)
    if "pulse_space" in params:
        params["pulse_space"] = {
            k: tuple(v) for k, v in params["pulse_space"].items()}
    return params


@dataclasses.dataclass
class RunConfig:
    """Complete training-run description."""

    model: Dict[str, Any]
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    curriculum: List[CurriculumBand] = dataclasses.field(
        default_factory=lambda: [CurriculumBand(d) for d in (0.4, 0.7, 1.0)])
    train_set_size: int = 10000
    eval_set_size: int = 1000
    save_path: Optional[str] = None

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "RunConfig":
        d = dict(d)
        if "pulse_space" in d.get("model", {}):
            d["model"]["pulse_space"] = {
                k: tuple(v) for k, v in d["model"]["pulse_space"].items()}
        if "train" in d and isinstance(d["train"], dict):
            d["train"] = TrainConfig(**d["train"])
        if "curriculum" in d:
            d["curriculum"] = [
                CurriculumBand(**b) if isinstance(b, dict)
                else CurriculumBand(*b)
                for b in d["curriculum"]]
        return cls(**d)

    def to_dict(self) -> Dict[str, Any]:
        out = dataclasses.asdict(self)
        return out


def load_run_config(json_path: str) -> RunConfig:
    with open(json_path) as f:
        return RunConfig.from_dict(json.load(f))
