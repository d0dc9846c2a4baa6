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
    return _StubMeta("Stub_" + name, (object,), {})


class _PermissiveModule(types.ModuleType):
    def __getattr__(self, name):
        if name.startswith("__"):
            raise AttributeError(name)
        return _make_stub(name)


def install_reference_stubs() -> None:
    tv = sys.modules.get("torchvision")
    if tv is None or not isinstance(getattr(tv, "models", None), _PermissiveModule):
        tv = types.ModuleType("torchvision")
        tv.models = _PermissiveModule("torchvision.models")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv.models
    sys.modules.setdefault("cvxpy", types.ModuleType("cvxpy"))
    sys.modules.setdefault("gudhi", types.ModuleType("gudhi"))
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)

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
