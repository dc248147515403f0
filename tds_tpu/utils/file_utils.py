"""Asset path resolution (analog of src/utils/file_utils.hpp:42-49).

Search order: explicit TDS_TPU_DATA_PATH env var, the package's bundled
``data/`` directory, ./data, and (when present, e.g. in CI containers that
mount it) the reference checkout's data directory.
"""

import os
from typing import List, Optional

_PACKAGE_DATA = os.path.join(os.path.dirname(os.path.dirname(__file__)), "data")

_SEARCH_PATHS: List[str] = []


def data_search_paths() -> List[str]:
    paths = []
    env = os.environ.get("TDS_TPU_DATA_PATH")
    if env:
        paths.extend(env.split(os.pathsep))
    paths.extend(_SEARCH_PATHS)
    paths.append(_PACKAGE_DATA)
    paths.append(os.path.join(os.getcwd(), "data"))
    # Last-resort fallback to a mounted reference checkout (CI containers).
    # TDS_TPU_NO_REFERENCE_DATA=1 disables it, proving the bundled assets
    # suffice on their own.
    if not os.environ.get("TDS_TPU_NO_REFERENCE_DATA"):
        ref = "/root/reference/data"
        if os.path.isdir(ref):
            paths.append(ref)
    return paths


def add_search_path(path: str) -> None:
    _SEARCH_PATHS.insert(0, path)


def find_file(name: str) -> str:
    if os.path.isabs(name) and os.path.exists(name):
        return name
    for base in data_search_paths():
        candidate = os.path.join(base, name)
        if os.path.exists(candidate):
            return candidate
    raise FileNotFoundError(
        f"asset {name!r} not found in {data_search_paths()}"
    )
