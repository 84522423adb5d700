"""User-extension surface: a stage registry + declarative pipeline specs.

Mirrors the reference's plugin points (SURVEY.md §2.9): the ``MODELS`` dict
that third-party pages extend at import time
(``pages/llm_parsing_benchmark.py:223-255``,
``pages/parallel_llm_parsing_test.py:39-65``) and the fixed named-stage
pipeline (``cv_api/pipeline.py``). The idiomatic Ray Data plugin point is "a
callable or class passed to ``map_batches``" — so a registered stage is
exactly that, plus its resource/batch defaults, and a pipeline is a list of
stage names.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

import ray.data


@dataclass(frozen=True)
class StageSpec:
    """A named map stage: callable (fn or actor class) + execution defaults."""

    name: str
    fn: Callable | type
    batch_size: int | None = None
    batch_format: str = "pyarrow"
    num_cpus: float | None = None
    concurrency: int | tuple[int, int] | None = None  # set → actor pool
    fn_kwargs: dict = field(default_factory=dict)

    def apply(self, ds: ray.data.Dataset, **overrides: Any) -> ray.data.Dataset:
        kwargs: dict[str, Any] = {
            "batch_size": self.batch_size,
            "batch_format": self.batch_format,
            "zero_copy_batch": True,
        }
        if self.fn_kwargs:
            kwargs["fn_kwargs"] = dict(self.fn_kwargs)
        if self.num_cpus is not None:
            kwargs["num_cpus"] = self.num_cpus
        if self.concurrency is not None:
            kwargs["concurrency"] = self.concurrency
        kwargs.update(overrides)
        return ds.map_batches(self.fn, **kwargs)


_REGISTRY: dict[str, StageSpec] = {}


def register_stage(spec: StageSpec, *, replace: bool = False) -> StageSpec:
    """Register a stage; third parties call this at import time (≙ the
    reference's ``MODELS.update(...)``). Latest registration wins only when
    ``replace=True`` — accidental shadowing is an error."""
    if spec.name in _REGISTRY and not replace:
        raise ValueError(f"stage {spec.name!r} already registered")
    _REGISTRY[spec.name] = spec
    return spec


def get_stage(name: str) -> StageSpec:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown stage {name!r}; registered: {sorted(_REGISTRY)}"
        ) from None


def registered_stages() -> dict[str, StageSpec]:
    return dict(_REGISTRY)


def build_pipeline(ds: ray.data.Dataset, stage_names: list[str]) -> ray.data.Dataset:
    """Compose registered stages over a Dataset, in order (≙ the reference's
    fixed named-stage chain, cv_api/main.py:240-244)."""
    for name in stage_names:
        ds = get_stage(name).apply(ds)
    return ds


def _register_builtins() -> None:
    from .stages.extract import explode_spans, ocr_media_spans, strip_html_spans

    register_stage(StageSpec("explode_spans", explode_spans), replace=True)
    register_stage(StageSpec("strip_html", strip_html_spans), replace=True)
    register_stage(StageSpec("ocr_media", ocr_media_spans), replace=True)


_register_builtins()
