"""Config loading tests: reference-JSON compatibility and RunConfig."""

import json

from universal_quantum_optimal_control_tpu.training import (
    CurriculumBand,
    TrainConfig,
)
from universal_quantum_optimal_control_tpu.utils import (
    RunConfig,
    load_model_params,
    load_run_config,
)


def test_load_model_params_reference_format(tmp_path):
    """The reference's model_params.json format loads unchanged
    (pulse-space ranges tuple-ized — SCORE.py:260-269)."""
    cfg = {
        "num_qubits": 1,
        "pulse_space": {"phi": [-3.15, 3.15], "tau": [0.1, 0.5]},
        "max_pulses": 100, "d_model": 512, "n_layers": 8,
        "n_heads": 16, "dropout": 0.1, "finetune": None,
    }
    p = tmp_path / "model_params.json"
    p.write_text(json.dumps(cfg))
    loaded = load_model_params(str(p))
    assert loaded["pulse_space"]["phi"] == (-3.15, 3.15)
    assert loaded["pulse_space"]["tau"] == (0.1, 0.5)
    assert loaded["max_pulses"] == 100


def test_shipped_configs_match_reference_values():
    """Our shipped configs carry the reference's exact hyperparameters."""
    from pathlib import Path

    cfg_dir = (Path(__file__).parent.parent
               / "universal_quantum_optimal_control_tpu" / "configs")
    uni = load_model_params(str(cfg_dir / "universal_single_qubit.json"))
    assert (uni["max_pulses"], uni["d_model"], uni["n_layers"],
            uni["n_heads"]) == (100, 512, 8, 16)
    assert uni["pulse_space"]["tau"] == (0.1, 0.5)
    grape = load_model_params(str(cfg_dir / "grape_single_qubit.json"))
    assert grape["num_pulses"] == 400
    assert grape["pulse_space"]["tau"] == (0.035, 0.07)
    l400 = load_model_params(
        str(cfg_dir / "universal_single_qubit_length400.json"))
    assert l400["max_pulses"] == 400
    assert l400["pulse_space"]["tau"] == (-0.5, 0.5)


def test_run_config_roundtrip(tmp_path):
    d = {
        "model": {"pulse_space": {"phi": [-3.15, 3.15], "tau": [0.1, 0.5]},
                  "max_pulses": 8},
        "train": {"monte_carlo": 64, "batch_size": 4, "epochs": 2,
                  "loss": "neg_log"},
        "curriculum": [{"delta_std": 0.4}, {"delta_std": 0.7,
                                            "epsilon_std": 0.1}],
        "save_path": "w",
    }
    p = tmp_path / "run.json"
    p.write_text(json.dumps(d))
    rc = load_run_config(str(p))
    assert isinstance(rc, RunConfig)
    assert isinstance(rc.train, TrainConfig)
    assert rc.train.loss == "neg_log"
    assert rc.curriculum == [CurriculumBand(0.4),
                             CurriculumBand(0.7, 0.1)]
    assert rc.model["pulse_space"]["tau"] == (0.1, 0.5)
    out = rc.to_dict()
    assert out["train"]["monte_carlo"] == 64
