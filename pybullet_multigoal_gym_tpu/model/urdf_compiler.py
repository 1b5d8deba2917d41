"""Python front-end for the native URDF model compiler (native/urdf_compiler.cpp).

The framework ships pre-compiled model constants (kuka_model.py,
ops/scene.py); this wrapper runs the C++ extractor at dev/test time to
(re)generate and validate them against the URDF sources. Loads the shared
library via ctypes (no pybind11 in the image); builds it on first use if the
toolchain is present.
"""

import ctypes
import json
import os
import subprocess

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), 'native')
_LIB_PATH = os.path.join(_NATIVE_DIR, 'liburdf_compiler.so')

_lib = None


def _ensure_built():
    if not os.path.exists(_LIB_PATH):
        subprocess.run(['make', '-C', _NATIVE_DIR, 'liburdf_compiler.so'],
                       check=True, capture_output=True)


def _get_lib():
    global _lib
    if _lib is None:
        _ensure_built()
        _lib = ctypes.CDLL(_LIB_PATH)
        _lib.compile_urdf.restype = ctypes.c_void_p
        _lib.compile_urdf.argtypes = [ctypes.c_char_p]
        _lib.free_model_json.argtypes = [ctypes.c_void_p]
    return _lib


def compile_urdf(path: str) -> dict:
    """Parse a URDF file into a model dict (links, joints, contacts)."""
    lib = _get_lib()
    ptr = lib.compile_urdf(os.fsencode(path))
    try:
        out = ctypes.string_at(ptr).decode('utf-8')
    finally:
        lib.free_model_json(ptr)
    model = json.loads(out)
    if 'error' in model:
        raise ValueError('%s: %s' % (path, model['error']))
    return model
