"""Checkpoint auto-download into the local cache.

The reference downloads release weights on first use: timm
``load_pretrained`` fetches the ``default_cfgs`` URL inside
``build_model_with_cfg`` (reference: models/helpers/vit_helpers.py:261,
URL table models/maest.py:64-153). ``get_maest(pretrained=True)`` mirrors
that here: if the released ``.ckpt`` is not already in the cache dir, it
is fetched from ``ArchSpec.url`` and committed atomically.

Offline environments: set ``MAEST_TPU_OFFLINE=1`` to skip the network
attempt entirely (the clear pre-place-the-file error is raised instead),
or drop the files into ``MAEST_TPU_CACHE`` yourself.
"""

from __future__ import annotations

import os
import shutil
import urllib.error
import urllib.request
from pathlib import Path

from ..models.registry import ArchSpec, cached_checkpoint_path

__all__ = ["fetch_checkpoint", "offline", "FetchError"]


class FetchError(OSError):
    """A checkpoint download failed (no egress, HTTP error, timeout)."""


def offline() -> bool:
    return os.environ.get("MAEST_TPU_OFFLINE", "").strip().lower() in (
        "1", "true", "yes", "on",
    )


def fetch_checkpoint(spec: ArchSpec, dest: str | os.PathLike | None = None,
                     timeout: float = 30.0) -> Path:
    """Ensure ``spec``'s released checkpoint exists locally; return its path.

    Downloads to a sibling temp file and ``os.replace``s into place, so a
    partially-written file can never be mistaken for a checkpoint and
    concurrent fetches of the same arch both land safely.
    """
    dest = Path(dest) if dest is not None else cached_checkpoint_path(spec)
    if dest.exists():
        return dest
    if offline():
        raise FetchError(
            f"MAEST_TPU_OFFLINE is set; not downloading {spec.url}")
    dest.parent.mkdir(parents=True, exist_ok=True)
    tmp = dest.with_name(dest.name + f".tmp.{os.getpid()}")
    try:
        with urllib.request.urlopen(spec.url, timeout=timeout) as resp, \
                open(tmp, "wb") as out:
            shutil.copyfileobj(resp, out, length=1 << 20)
        os.replace(tmp, dest)
    except (urllib.error.URLError, TimeoutError, OSError) as err:
        raise FetchError(f"failed to download {spec.url}: {err}") from err
    finally:
        tmp.unlink(missing_ok=True)
    return dest
