"""Memoizing URDF loader (analog of src/urdf/urdf_cache.hpp:28-141).

Caches both the parsed document and the finalized model keyed by
(resolved path, floating flag, dtype), so env constructors and vectorized
training loops don't re-parse per instance — the same role the reference's
UrdfCache plays for its compiled-model reuse.
"""

from typing import Dict, Tuple

from tds_tpu.urdf.converter import convert_to_multibody
from tds_tpu.urdf.parser import parse_urdf_file, parse_urdf_string
from tds_tpu.utils.file_utils import find_file

_DOC_CACHE: Dict[str, object] = {}
_MODEL_CACHE: Dict[Tuple, object] = {}


def load_document(name: str):
    path = find_file(name)
    if path not in _DOC_CACHE:
        _DOC_CACHE[path] = parse_urdf_file(path)
    return _DOC_CACHE[path]


def construct(name: str, is_floating: bool = False, dtype=None,
              mesh_contacts: int = 0):
    """Returns (MultiBodyModel, collision attachments), cached.

    ``mesh_contacts > 0`` opts URDF collision meshes into the mesh
    narrowphase with that many contact candidates per pair (beyond
    reference; default 0 keeps meshes visual-only, matching TDS)."""
    path = find_file(name)
    key = (path, is_floating, str(dtype), mesh_contacts)
    if key not in _MODEL_CACHE:
        doc = load_document(path)
        _MODEL_CACHE[key] = convert_to_multibody(
            doc, is_floating, dtype, mesh_contacts=mesh_contacts
        )
    return _MODEL_CACHE[key]


def construct_from_string(text: str, is_floating: bool = False, dtype=None,
                          mesh_contacts: int = 0):
    doc = parse_urdf_string(text)
    return convert_to_multibody(
        doc, is_floating, dtype, mesh_contacts=mesh_contacts
    )


def clear_cache():
    _DOC_CACHE.clear()
    _MODEL_CACHE.clear()
