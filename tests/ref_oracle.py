"""Shared machinery for running /root/reference modules as test oracles.

The reference imports torchvision (absent from this image), cvxpy and gudhi
at module scope; piq's fid_inception even SUBCLASSES torchvision classes.
`install_reference_stubs()` registers permissive stand-ins so the reference
code imports, and puts /root/reference on sys.path (namespace packages)."""

from __future__ import annotations

import sys
import types

REF_ROOT = "/root/reference"


class _StubMeta(type):
    def __getattr__(cls, name):
        if name.startswith("__"):
            raise AttributeError(name)
        return _make_stub(name)


def _make_stub(name):
    ns = {
        "__init__": lambda self, *a, **k: None,
        "__call__": lambda self, *a, **k: self,
        "__getattr__": lambda self, item: _raise_dunder(item) or _make_stub(item)(),
        "__delattr__": lambda self, item: None,
        "__iter__": lambda self: iter(()),
    }
    return _StubMeta("Stub_" + name, (object,), ns)


def _raise_dunder(item):
    if item.startswith("__"):
        raise AttributeError(item)


class _PermissiveModule(types.ModuleType):
    def __getattr__(self, name):
        if name.startswith("__"):
            raise AttributeError(name)
        return _make_stub(name)


def install_reference_stubs() -> None:
    tv = sys.modules.get("torchvision")
    if tv is None or not isinstance(getattr(tv, "models", None), _PermissiveModule):
        tv = _PermissiveModule("torchvision")
        sys.modules["torchvision"] = tv
        for sub in ("models", "utils", "transforms", "transforms.functional"):
            mod = _PermissiveModule(f"torchvision.{sub}")
            sys.modules[f"torchvision.{sub}"] = mod
            parent, _, leaf = f"torchvision.{sub}".rpartition(".")
            setattr(sys.modules[parent], leaf, mod)
        tv.models = sys.modules["torchvision.models"]
    sys.modules.setdefault("cvxpy", types.ModuleType("cvxpy"))
    sys.modules.setdefault("gudhi", types.ModuleType("gudhi"))
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    # the vendored timm tree imports itself absolutely ("from timm.data
    # import ..."), so it must ALSO be importable as top-level `timm`
    # (arch/CTformer/networks.py:7 pulls arch.timm.models.layers)
    ref_arch = REF_ROOT + "/arch"
    if ref_arch not in sys.path:
        sys.path.insert(0, ref_arch)

    import torch

    # piq 0.5.2 uses the torch<=1.7 fft API
    if not hasattr(torch, "rfft"):
        def _rfft(x, signal_ndim, onesided=True):
            assert signal_ndim == 2 and not onesided
            return torch.view_as_real(torch.fft.fft2(x))

        def _ifft(x, signal_ndim):
            assert signal_ndim == 2
            return torch.view_as_real(
                torch.fft.ifft2(torch.view_as_complex(x)))

        torch.rfft = _rfft
        torch.ifft = _ifft
