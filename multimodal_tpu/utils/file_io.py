"""Path manager.

Parity with reference ``utils/file_io.py:10`` (iopath PathManager wrapper):
a minimal local/remote path abstraction. Zero-egress environments resolve
only local paths; http(s) URLs raise with a clear message instead of
attempting a download.
"""

from __future__ import annotations

import os


class PathManager:
    def get_local_path(self, path: str) -> str:
        if path.startswith(("http://", "https://")):
            raise RuntimeError(
                f"remote checkpoint {path!r} cannot be fetched in this "
                "environment; download it out-of-band and pass a local path"
            )
        return os.path.expanduser(path)

    def open(self, path: str, mode: str = "r", **kwargs):
        return open(self.get_local_path(path), mode, **kwargs)

    def exists(self, path: str) -> bool:
        return os.path.exists(self.get_local_path(path))


_PATH_MANAGER = PathManager()
