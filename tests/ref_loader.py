"""Load reference torch modules from /root/reference as parity oracles.

The reference's `sam2/__init__.py` initializes hydra (not installed here), so we
synthesize namespace packages pointing at the reference tree and import leaf
modules directly. The reference is used ONLY as a numerical oracle in tests —
none of its code ships in this package.
"""
import sys
import types
from pathlib import Path

REF = Path("/root/reference")


def reference_available() -> bool:
    return (REF / "sam2" / "modeling" / "sam2_base.py").exists()


def _ensure_pkg(name: str, path: Path):
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    mod.__path__ = [str(path)]
    mod.__package__ = name
    sys.modules[name] = mod
    return mod


def install_reference_shim():
    """Register `sam2.*` / `no_time_to_train.*` namespaces without running
    their __init__ (which requires hydra), then make leaf imports work."""
    if not reference_available():
        raise RuntimeError("reference repo not mounted at /root/reference")
    _ensure_pkg("sam2", REF / "sam2")
    _ensure_pkg("no_time_to_train", REF / "no_time_to_train")
    # sam2.utils.misc imports tqdm & PIL only; safe. modeling/__init__ is empty.
    return True
