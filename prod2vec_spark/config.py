"""Config loading + validation (SURVEY.md §2.1 S8 / P8).

Reference: YAML loaded and pydantic-validated at DAG parse
(/root/reference/config/load_prod2vec_config.py:94-135,
 config/prod2vec_config.yaml).  The engine keeps the same surface —
YAML in, validated PipelineConfig out — with plain dataclass checks
(pydantic not required in the runtime image).
"""

from __future__ import annotations

from dataclasses import fields

from prod2vec_spark.ml.prod2vec import Prod2VecParams
from prod2vec_spark.pipeline import PipelineConfig


class ConfigError(ValueError):
    pass


def validate(cfg: PipelineConfig) -> PipelineConfig:
    """The checks the reference's pydantic schema enforces, mapped to
    the engine's parameters (load_prod2vec_config.py:6-105)."""
    if cfg.num_prods < 2:
        raise ConfigError("num_prods must be >= 2 (UNK + at least one product)")
    if cfg.window_size < 1:
        raise ConfigError("window_size must be >= 1")
    if cfg.num_ns < 1:
        raise ConfigError("num_ns must be >= 1")
    if cfg.max_basket_length < 1:
        raise ConfigError("max_basket_length must be >= 1")
    if cfg.train.vector_size < 1:
        raise ConfigError("vector_size must be >= 1")
    if not (0.0 < cfg.train.step_size):
        raise ConfigError("step_size must be positive")
    if cfg.tune_strategy not in ("grid", "random", "tpe"):
        raise ConfigError("tune_strategy must be 'grid', 'random' or 'tpe'")
    if (
        cfg.run_hyperparameter_opt
        and cfg.tune_strategy == "grid"
        and not (cfg.tune_dims and cfg.tune_lrs)
    ):
        raise ConfigError("grid tuning enabled but tune_dims/tune_lrs empty")
    if (
        cfg.run_hyperparameter_opt
        and cfg.tune_strategy in ("random", "tpe")
        and cfg.tune_n_trials < 1
    ):
        raise ConfigError(f"{cfg.tune_strategy} tuning enabled but tune_n_trials < 1")
    return cfg


def from_dict(d: dict) -> PipelineConfig:
    train_d = d.pop("train", {})
    known = {f.name for f in fields(PipelineConfig)}
    unknown = set(d) - known
    if unknown:
        raise ConfigError(f"unknown config keys: {sorted(unknown)}")
    cfg = PipelineConfig(**d)
    if train_d:
        t_known = {f.name for f in fields(Prod2VecParams)}
        t_unknown = set(train_d) - t_known
        if t_unknown:
            raise ConfigError(f"unknown train keys: {sorted(t_unknown)}")
        cfg.train = Prod2VecParams(**train_d)
    return validate(cfg)


def from_yaml(path: str) -> PipelineConfig:
    """S8: YAML → validated config (gated import — yaml is present in
    this image but the engine degrades gracefully without it)."""
    try:
        import yaml
    except ImportError as e:  # pragma: no cover
        raise ConfigError("pyyaml not installed; use from_dict") from e
    with open(path) as f:
        return from_dict(yaml.safe_load(f) or {})
