"""Elastic recovery for long pre-training runs.

The reference has no failure handling — recovery is a manual re-launch
with ``ckpt_path`` (reference: ex_maest.py:45,90; ex_maest519.sh:6). On
TPU pods, preemptions, ICI resets and worker loss surface as runtime
errors thrown out of the jitted step. This module restarts ``fit`` from
the newest epoch checkpoint of the failed attempt, optionally
re-initializing ``jax.distributed``, bounded by ``max_restarts``.

Enable from the CLI with ``trainer.resilient=True`` (and optionally
``trainer.max_restarts=N``).
"""

from __future__ import annotations

import json
import logging
import time
from pathlib import Path
from typing import Callable, Optional

_logger = logging.getLogger("maest_tpu.resilience")

# Status codes / phrases that mark infrastructure failures (XLA runtime /
# distributed transport), as opposed to programming errors, which must
# propagate. Status codes match case-sensitively so e.g. the word
# "internal" in an ordinary error message does not trigger a restart.
_RECOVERABLE_STATUS = (
    "UNAVAILABLE",
    "DEADLINE_EXCEEDED",
    "ABORTED",
    "CANCELLED",
    "INTERNAL",
    "DATA_LOSS",
)
_RECOVERABLE_PHRASES = (
    "preempt",
    "connection reset",
    "failed to connect",
    "socket closed",
    "slice restart",
)
# Deterministic failures that re-running cannot fix — a retry would just
# recompile for minutes and die the same way (shape bugs, OOM, ...).
_FATAL_STATUS = (
    "INVALID_ARGUMENT",
    "RESOURCE_EXHAUSTED",
    "UNIMPLEMENTED",
    "NOT_FOUND",
    "OUT_OF_RANGE",
)
_RUNTIME_ERROR_TYPES = ("XlaRuntimeError", "JaxRuntimeError")


def _matches(msg: str, exc: BaseException) -> bool:
    # Both checks gate on runtime/IO error types: a programming error whose
    # message merely quotes a status word (ValueError("job CANCELLED ..."))
    # must stay fatal — retrying it burns minutes-long recompiles.
    if not isinstance(exc, (RuntimeError, OSError)):
        return False
    return any(s in msg for s in _RECOVERABLE_STATUS) or any(
        p in msg.lower() for p in _RECOVERABLE_PHRASES
    )


def is_recoverable(exc: BaseException) -> bool:
    """Infrastructure failure (restartable) vs programming error (fatal)."""
    msg = str(exc)
    is_xla = any(k.__name__ in _RUNTIME_ERROR_TYPES
                 for k in type(exc).__mro__)
    if is_xla:
        # XLA runtime errors default to restartable (chip resets surface
        # as INTERNAL / FAILED_PRECONDITION / UNAVAILABLE with relay-
        # dependent wording) EXCEPT deterministic statuses, which would
        # fail identically on every attempt.
        return not any(s in msg for s in _FATAL_STATUS)
    return _matches(msg, exc)


def latest_checkpoint(run_dir) -> Optional[str]:
    """Newest per-epoch checkpoint under ``<run_dir>/checkpoints`` (falls
    back to ``best``). Returns None when nothing was saved yet."""
    ckpt_dir = Path(run_dir) / "checkpoints"
    if not ckpt_dir.is_dir():
        return None
    best_epoch, best_path = -1, None
    for p in ckpt_dir.iterdir():
        if not p.is_dir() or not p.name.startswith("epoch-"):
            continue
        meta = ckpt_dir / f"{p.name}.meta.json"
        if not meta.exists():
            continue  # interrupted save
        try:
            epoch = json.loads(meta.read_text()).get("epoch", -1)
        except (json.JSONDecodeError, OSError):
            # a corrupt marker (pre-atomic-write saves, disk truncation)
            # means "unusable checkpoint", not "abort recovery forever"
            continue
        if epoch > best_epoch:
            best_epoch, best_path = epoch, p
    if best_path is None and (ckpt_dir / "best").is_dir():
        best_path = ckpt_dir / "best"
    return str(best_path) if best_path else None


def _reinit_distributed() -> None:
    """Tear down and re-establish the jax.distributed client so a restarted
    worker set can re-form the mesh (no-op on single-process runs)."""
    import jax

    if jax.process_count() <= 1:
        return
    try:
        jax.distributed.shutdown()
    except Exception:  # already torn down by the failure itself
        pass
    from ..parallel.mesh import init_distributed

    init_distributed()


def fit_with_recovery(
    cfg: dict,
    *,
    trainer_factory: Optional[Callable[[dict], object]] = None,
    max_restarts: Optional[int] = None,
    backoff_s: float = 10.0,
) -> dict:
    """``Trainer(cfg).fit()`` with automatic restart-from-checkpoint.

    Each attempt builds a fresh Trainer (new run dir); on a recoverable
    failure the next attempt resumes from the failed run's newest epoch
    checkpoint via ``ckpt_path``. Non-recoverable exceptions and restart
    exhaustion propagate.
    """
    if trainer_factory is None:
        from .loop import Trainer as trainer_factory  # noqa: N813

    if max_restarts is None:
        max_restarts = int(cfg["trainer"].get("max_restarts", 3))

    cfg = dict(cfg)
    restarts = 0
    while True:
        trainer = None
        try:
            # construction also does device work (mesh setup, param
            # sharding) and must be retryable — right after a preemption
            # the device may still be down when the next attempt starts
            trainer = trainer_factory(cfg)
            result = trainer.fit()
            if restarts:
                result = dict(result, restarts=restarts)
            return result
        except Exception as e:  # noqa: BLE001 - classified below
            if not is_recoverable(e) or restarts >= max_restarts:
                raise
            restarts += 1
            # on a construction failure keep resuming from the previous
            # attempt's checkpoint (already in cfg["ckpt_path"])
            if trainer is not None:
                try:
                    # async saves: let any in-flight orbax commit land
                    # (atomic tmp-dir rename) before scanning for the
                    # newest checkpoint
                    trainer.finalize_checkpoints()
                except Exception:  # the device may be gone entirely
                    pass
            ckpt = latest_checkpoint(trainer.run_dir) if trainer else None
            _logger.warning(
                "recoverable failure (%s: %s); restart %d/%d from %s",
                type(e).__name__, str(e)[:200], restarts, max_restarts,
                ckpt or cfg.get("ckpt_path") or "scratch",
            )
            if ckpt:
                cfg["ckpt_path"] = ckpt
            time.sleep(backoff_s)
            _reinit_distributed()
