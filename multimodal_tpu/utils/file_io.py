"""Path manager with a local checkpoint cache.

Analog of the reference's iopath ``_PATH_MANAGER`` (``utils/file_io.py:10``,
used by ``load_module_from_url``, ``utils/common.py:99-107``): resolves both
local paths and http(s) URLs. URLs resolve through a local cache directory
(``MMTPU_CACHE_DIR``, default ``~/.cache/multimodal_tpu``); a cache hit
returns the cached file, a miss downloads only when ``MMTPU_ALLOW_DOWNLOAD=1``
(zero-egress environments pre-populate the cache out-of-band instead).
"""

from __future__ import annotations

import hashlib
import os
import shutil
from urllib.parse import urlparse


def _cache_dir() -> str:
    return os.environ.get(
        "MMTPU_CACHE_DIR", os.path.expanduser("~/.cache/multimodal_tpu")
    )


class PathManager:
    def cached_path_for_url(self, url: str) -> str:
        """Deterministic cache location for a URL: <cache>/<sha8>_<basename>."""
        name = os.path.basename(urlparse(url).path) or "checkpoint"
        digest = hashlib.sha256(url.encode()).hexdigest()[:8]
        return os.path.join(_cache_dir(), f"{digest}_{name}")

    def get_local_path(self, path: str) -> str:
        if not path.startswith(("http://", "https://")):
            return os.path.expanduser(path)
        local = self.cached_path_for_url(path)
        if os.path.exists(local):
            return local
        if os.environ.get("MMTPU_ALLOW_DOWNLOAD") == "1":
            import urllib.request

            os.makedirs(_cache_dir(), exist_ok=True)
            tmp = local + ".tmp"
            with urllib.request.urlopen(path) as r, open(tmp, "wb") as f:
                shutil.copyfileobj(r, f)
            os.replace(tmp, local)
            return local
        raise RuntimeError(
            f"remote checkpoint {path!r} is not in the local cache "
            f"({local}); this environment has no egress — download it "
            "out-of-band into the cache path above, or set "
            "MMTPU_ALLOW_DOWNLOAD=1 where egress is available"
        )

    def add_to_cache(self, url: str, local_file: str) -> str:
        """Register an out-of-band downloaded file as the cache entry for url."""
        dest = self.cached_path_for_url(url)
        os.makedirs(_cache_dir(), exist_ok=True)
        shutil.copyfile(os.path.expanduser(local_file), dest)
        return dest

    def open(self, path: str, mode: str = "r", **kwargs):
        return open(self.get_local_path(path), mode, **kwargs)

    def exists(self, path: str) -> bool:
        try:
            return os.path.exists(self.get_local_path(path))
        except RuntimeError:
            return False


_PATH_MANAGER = PathManager()
