"""
Pickle interop with reference Sniffles2 SNF files.

SNF blocks are pickled object graphs; the pickle stream stores each
class as a (module, qualname) global reference. Reference Sniffles2
(reference: snf.py:116-119) unpickles with the stdlib loader, so the
only class paths it can resolve are its own ("sniffles.sv.SVCall", ...).
Our data-model classes mirror the reference's names and field layouts
one-to-one (svcall.py, leads.py, cluster.py, region.py, io/snfp.py);
registering them under the reference module paths makes every SNF this
tool writes directly loadable by reference Sniffles2 — the write-side
counterpart of the read-side _CompatUnpickler in io/snf.py.

Resolution of the "sniffles.*" alias names is provided by a meta-path
finder rather than one-shot sys.modules entries: pickling re-imports
the module named by a class's __module__ on every dump/load, and
embedding applications (or tests exercising the genuine reference
package) may purge "sniffles*" from sys.modules at any time. The finder
sits at the END of sys.meta_path, so a genuinely installed `sniffles`
package always wins; our reader does not depend on the alias either way
(_CompatUnpickler maps reference paths to our classes explicitly).
"""
from __future__ import annotations

import importlib
import importlib.abc
import importlib.util
import sys
import types

# reference module name -> our implementing module name
_ALIASES: dict[str, str] = {}


class _AliasLoader(importlib.abc.Loader):
    """Produces a fresh module object whose namespace is the implementing
    module's: attribute lookups (and pickle's save-side identity check,
    `getattr(sys.modules[m], name) is cls`) resolve to the very same
    class objects, while the implementing module itself keeps its own
    __name__/__spec__ untouched."""

    def __init__(self, impl_name: str, is_package: bool):
        self._impl_name = impl_name
        self._is_package = is_package

    def create_module(self, spec):
        mod = types.ModuleType(spec.name)
        if self._is_package:
            mod.__path__ = []
        return mod

    def exec_module(self, module):
        if self._impl_name:
            impl = importlib.import_module(self._impl_name)
            for k, v in impl.__dict__.items():
                if k not in ("__name__", "__spec__", "__loader__",
                             "__package__", "__path__", "__file__"):
                    module.__dict__.setdefault(k, v)


class _ReferenceAliasFinder(importlib.abc.MetaPathFinder):
    def find_spec(self, fullname, path=None, target=None):
        if fullname == "sniffles" and _ALIASES:
            return importlib.util.spec_from_loader(
                fullname, _AliasLoader("", True), is_package=True)
        impl = _ALIASES.get(fullname)
        if impl is None:
            return None
        return importlib.util.spec_from_loader(
            fullname, _AliasLoader(impl, False))


_FINDER = _ReferenceAliasFinder()


def alias_module_for_pickle(ref_name: str, module_name: str, classes) -> None:
    """Make `classes` of module `module_name` pickle as members of the
    reference module `ref_name` (e.g. "sniffles.sv"), resolvable through
    the alias finder for unpickling in-process."""
    for cls in classes:
        cls.__module__ = ref_name
    _ALIASES[ref_name] = module_name
    if _FINDER not in sys.meta_path:
        sys.meta_path.append(_FINDER)


# ---------------------------------------------------------------------------
# Pickle state application for slots dataclasses
# ---------------------------------------------------------------------------

_STATE_DEFAULTS_CACHE: dict[type, tuple] = {}


def _state_defaults(cls) -> tuple:
    """(name, default_or_factory) for every defaulted dataclass field."""
    cached = _STATE_DEFAULTS_CACHE.get(cls)
    if cached is None:
        import dataclasses
        cached = tuple(
            (f.name,
             f.default_factory if f.default_factory is not dataclasses.MISSING
             else f.default)
            for f in dataclasses.fields(cls)
            if f.default is not dataclasses.MISSING
            or f.default_factory is not dataclasses.MISSING)
        _STATE_DEFAULTS_CACHE[cls] = cached
    return cached


def _apply_pickle_state(obj, state) -> None:
    """__setstate__ body for slots dataclasses that must load both their
    own slots pickle form and dict-form states from the reference's
    plain dataclasses (SNF interop) or from pre-slots builds.

    Dict-form states may lack fields added since (-> dataclass default)
    and may carry stale cached-property entries (-> ignored)."""
    if isinstance(state, tuple):
        d, s = state
    else:
        d, s = state, None
    cls = obj.__class__
    for k, v in _state_defaults(cls):
        object.__setattr__(obj, k, v() if callable(v) else v)
    fields = cls.__slots__
    for src in (d, s):
        if src:
            for k, v in src.items():
                if k in fields:
                    object.__setattr__(obj, k, v)
