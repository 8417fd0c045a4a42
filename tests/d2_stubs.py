"""Stub machinery for importing the REFERENCE detectron2 modules
(/root/reference/VPS_Module) without their heavy deps.

The reference tree imports fvcore/torchvision/iopath/pycocotools and the
compiled detectron2._C at module scope; none of these touch the forward
math of the modules the parity tests exercise (ResNet, FPN, heads), so a
meta-path finder fabricates permissive stand-ins, with a functional
yacs-style CfgNode (the config tree is built at import time)."""
import sys, types, importlib.abc, importlib.machinery, copy

import PIL.Image
if not hasattr(PIL.Image, "LINEAR"):
    PIL.Image.LINEAR = PIL.Image.BILINEAR

class _Any:
    def __init__(self, *a, **k): pass
    def __call__(self, *a, **k):
        # decorator pattern: @REGISTRY.register() must return the class
        if len(a) == 1 and not k and isinstance(a[0], type):
            return a[0]
        return _Any()
    def __getattr__(self, k):
        if k.startswith("__") and k.endswith("__"):
            raise AttributeError(k)
        return _Any()
    def __mro_entries__(self, bases):
        class _AnyMeta(type):
            def __getattr__(cls, k):
                return lambda *a, **kw: None
        class _B(metaclass=_AnyMeta):
            def __init__(self, *a, **k): pass
            def __getattr__(self, k):
                if k.startswith("__") and k.endswith("__"):
                    raise AttributeError(k)
                return _Any()
        return (_B,)

class YacsCfg(dict):
    def __init__(self, init_dict=None, key_list=None, new_allowed=False):
        super().__init__(init_dict or {})
    def __getattr__(self, k):
        try: return self[k]
        except KeyError as e: raise AttributeError(k) from e
    def __setattr__(self, k, v): self[k] = v
    def clone(self): return copy.deepcopy(self)
    def freeze(self): pass
    def defrost(self): pass
    def is_frozen(self): return False
    def set_new_allowed(self, *a): pass
    def register_deprecated_key(self, *a): pass
    def register_renamed_key(self, *a): pass
    def merge_from_other_cfg(self, other): self.update(other)
    def merge_from_list(self, opts): pass
    def dump(self, **k): return ""
    @classmethod
    def load_cfg(cls, *a, **k): return cls()

STUB_PREFIXES = ("fvcore", "torchvision", "iopath", "pycocotools",
                 "cloudpickle", "omegaconf", "hydra", "portalocker",
                 "yacs")

class _AnyMeta(type):
    def __getattr__(cls, k):
        return lambda *a, **kw: None


class _AnyBase(metaclass=_AnyMeta):
    def __init__(self, *a, **k): pass
    def __call__(self, *a, **k):
        if len(a) == 1 and not k and isinstance(a[0], type):
            return a[0]
        return _Any()
    def __getattr__(self, k):
        if k.startswith("__") and k.endswith("__"):
            raise AttributeError(k)
        return _Any()


class AnyModule(types.ModuleType):
    __version__ = "0.15.0"
    def __getattr__(self, k):
        if k.startswith("__"):
            raise AttributeError(k)
        # CamelCase names are used as classes (isinstance targets,
        # base classes); lowercase as callables/objects
        if k[:1].isupper():
            v = _AnyMeta(k, (_AnyBase,), {})
        else:
            v = _Any()
        setattr(self, k, v)
        return v

class StubFinder(importlib.abc.MetaPathFinder, importlib.abc.Loader):
    def find_spec(self, name, path=None, target=None):
        if any(name == p or name.startswith(p + ".") for p in STUB_PREFIXES) \
           or name == "detectron2._C":
            return importlib.machinery.ModuleSpec(name, self, is_package=True)
        return None
    def create_module(self, spec):
        return AnyModule(spec.name)
    def exec_module(self, module):
        if module.__name__ in ("fvcore.common.config", "yacs.config"):
            module.CfgNode = YacsCfg

def install(ref="/root/reference/VPS_Module"):
    if not any(isinstance(f, StubFinder) for f in sys.meta_path):
        sys.meta_path.insert(0, StubFinder())
    if ref not in sys.path:
        sys.path.insert(0, ref)
