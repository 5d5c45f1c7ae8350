"""Experiment logging: wandb when available, local JSONL otherwise.

The reference uses wandb as its observability backbone (SURVEY.md §5.5),
optional via ``no_wandb``. This shim keeps the same three-call surface
(``init`` / ``log`` / ``finish``): if the wandb package is importable and
``WANDB_MODE`` isn't offline-disabled it is used directly; otherwise metrics
stream to ``<run_dir>/metrics.jsonl`` (one JSON object per call) so training
curves survive in any environment — including this one, where wandb isn't
installed."""
from __future__ import annotations

import json
import os
import time
from typing import Any, Optional

__all__ = ["init", "log", "finish", "is_active"]

_state: dict = {"backend": None, "file": None, "step": 0}

try:
    import wandb as _wandb  # type: ignore
except Exception:
    _wandb = None


def init(project: str = "flocoder-tpu", name: Optional[str] = None,
         config: Optional[dict] = None, output_dir: str = "runs") -> None:
    if _wandb is not None and os.environ.get("WANDB_MODE") != "disabled":
        _wandb.init(project=project, name=name, config=config or {})
        _state["backend"] = "wandb"
        return
    run_name = name or time.strftime("%Y%m%d-%H%M%S")
    run_dir = os.path.join(output_dir, project, run_name)
    os.makedirs(run_dir, exist_ok=True)
    path = os.path.join(run_dir, "metrics.jsonl")
    _state["backend"] = "jsonl"
    _state["file"] = open(path, "a")
    if config:
        _state["file"].write(json.dumps({"_config": _plain(config)}) + "\n")
        _state["file"].flush()


def _plain(obj: Any) -> Any:
    if isinstance(obj, dict):
        return {k: _plain(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_plain(v) for v in obj]
    if hasattr(obj, "item"):
        try:
            return obj.item()
        except Exception:
            return str(obj)
    if isinstance(obj, (int, float, str, bool)) or obj is None:
        return obj
    return str(obj)


def log(metrics: dict, step: Optional[int] = None) -> None:
    if _state["backend"] == "wandb":
        # image-path values become wandb.Image so grids render in the UI
        metrics = {k: (_wandb.Image(v) if isinstance(v, str) and
                       v.endswith((".png", ".jpg")) and os.path.exists(v)
                       else v)
                   for k, v in metrics.items()}
        _wandb.log(metrics, step=step)
    elif _state["backend"] == "jsonl" and _state["file"] is not None:
        rec = _plain(metrics)
        rec["_step"] = step if step is not None else _state["step"]
        rec["_t"] = time.time()
        _state["file"].write(json.dumps(rec) + "\n")
        _state["file"].flush()
    _state["step"] += 1


def finish() -> None:
    if _state["backend"] == "wandb":
        _wandb.finish()
    elif _state["file"] is not None:
        _state["file"].close()
    _state.update({"backend": None, "file": None, "step": 0})


def is_active() -> bool:
    return _state["backend"] is not None
