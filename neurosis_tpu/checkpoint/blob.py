"""Remote (blob-store) checkpoint IO over fsspec.

Parity target: trainer/checkpoint_io.py:17-62 (BlobCheckpointIO) — the
reference serializes the Lightning checkpoint dict with torch.save into an
Azure blob via adlfs. TPU-native redesign: the host-side state pytree is
serialized with flax msgpack (no pickle, framework-portable) and written
through ANY fsspec filesystem (az://, gs://, s3://, memory://, file://...),
so checkpoints survive pod preemption without local disk. Writes are
buffered fully in memory first (same BytesIO strategy as the reference) and
optionally handed to a background thread so the train loop never blocks on
cloud round-trips.
"""

from __future__ import annotations

import logging
import re
import threading
from typing import Any, Optional

import jax
import numpy as np

logger = logging.getLogger(__name__)

_STEP_RE = re.compile(r"step_(\d+)\.msgpack$")


def _to_host(tree: Any) -> Any:
    """Fetch a (possibly sharded) device pytree to host numpy."""
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


class BlobCheckpointIO:
    """Save/load/list checkpoints under a base URL on any fsspec filesystem.

    Layout: `<base_url>/step_<NNNNNNNN>.msgpack`, flax-serialized state dicts.
    """

    def __init__(
        self,
        base_url: str,
        storage_options: Optional[dict] = None,
        async_write: bool = True,
        filesystem=None,
    ):
        self.base_url = base_url.rstrip("/")
        self.storage_options = dict(storage_options or {})
        self.async_write = async_write
        self._fs = filesystem
        self._base_path: Optional[str] = None
        self._pending: Optional[threading.Thread] = None

    # -- filesystem ---------------------------------------------------------

    @property
    def fs(self):
        if self._fs is None:
            import fsspec

            self._fs, self._base_path = fsspec.core.url_to_fs(self.base_url, **self.storage_options)
        return self._fs

    @property
    def base_path(self) -> str:
        if self._base_path is None:
            _ = self.fs  # resolves both
            if self._base_path is None:  # injected filesystem: strip scheme
                self._base_path = self.base_url.split("://", 1)[-1]
        return self._base_path

    def _path(self, step: int) -> str:
        return f"{self.base_path}/step_{int(step):08d}.msgpack"

    # -- save ---------------------------------------------------------------

    def save_checkpoint(self, payload: Any, step: int, blocking: Optional[bool] = None) -> str:
        """Serialize `payload` (a pytree: params/opt_state/ema/step) and write
        it to the blob store. Non-blocking by default: serialization happens
        on the caller thread (device→host fetch must anyway), the network
        write happens in a daemon thread (one in flight; next save joins it).
        """
        from flax import serialization

        blocking = (not self.async_write) if blocking is None else blocking
        data = serialization.to_bytes(_to_host(payload))
        path = self._path(step)
        self.wait()  # at most one in-flight write

        def _write():
            try:
                self.fs.makedirs(self.base_path, exist_ok=True)
            except Exception:
                pass  # some blob stores have no real dirs
            with self.fs.open(path, "wb") as f:
                f.write(data)
            logger.info(f"checkpoint written to {self.base_url}/step_{int(step):08d}.msgpack")

        if blocking:
            _write()
        else:
            self._pending = threading.Thread(target=_write, daemon=True, name="blob-ckpt-write")
            self._pending.start()
        return path

    def wait(self) -> None:
        """Join any in-flight async write."""
        if self._pending is not None:
            self._pending.join()
            self._pending = None

    # -- load / list / remove ------------------------------------------------

    def list_steps(self) -> list:
        try:
            names = self.fs.ls(self.base_path, detail=False)
        except FileNotFoundError:
            return []
        steps = []
        for n in names:
            m = _STEP_RE.search(str(n))
            if m:
                steps.append(int(m.group(1)))
        return sorted(steps)

    def latest_step(self) -> Optional[int]:
        steps = self.list_steps()
        return steps[-1] if steps else None

    def load_checkpoint(self, step: int, template: Any) -> Any:
        """Read + deserialize into the structure of `template`."""
        from flax import serialization

        path = self._path(step)
        if not self.fs.isfile(path):
            raise FileNotFoundError(f"checkpoint not found: {self.base_url}/step_{int(step):08d}.msgpack")
        with self.fs.open(path, "rb") as f:
            data = f.read()
        return serialization.from_bytes(template, data)

    def remove_checkpoint(self, step: int) -> None:
        path = self._path(step)
        if self.fs.isfile(path):
            self.fs.rm(path)
            logger.debug(f"removed checkpoint {path}")

    def prune(self, keep: int) -> None:
        """Keep the newest `keep` checkpoints (ModelCheckpoint max_to_keep)."""
        steps = self.list_steps()
        for s in steps[:-keep] if keep > 0 else []:
            self.remove_checkpoint(s)


def is_remote_url(path: Optional[str]) -> bool:
    """True for fsspec URLs that are not plain local paths."""
    return bool(path) and "://" in str(path) and not str(path).startswith("file://")
