"""Import pieces of the PyTorch reference (/root/reference) for golden
numeric-parity tests.

The reference's modules import ``pytorch_lightning``/``omegaconf``/
``tensordict``/``wandb`` at module level, none of which are installed here —
only the pieces they actually use at test time are stubbed. NOTHING from the
reference is copied into this repo; the reference code is loaded read-only at
test time and compared against our independent implementation.
"""
from __future__ import annotations

import importlib.util
import inspect
import sys
import types

REF_ROOT = "/root/reference"


def load_standalone(name: str, path: str):
    """Load a reference module that only needs torch/numpy/einops."""
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _stub_module(name: str) -> types.ModuleType:
    """A sys.modules stub that survives third-party introspection: tools like
    ``torch._dynamo.trace_rules`` walk sys.modules calling
    ``importlib.util.find_spec`` (raises if ``__spec__`` is None) and
    ``inspect.getsourcefile`` (needs a string ``__file__``)."""
    import importlib.machinery

    mod = types.ModuleType(name)
    mod.__file__ = f"<{name}-stub>"
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    return mod


def _install_stubs():
    import torch.nn as nn

    if "omegaconf" not in sys.modules:
        om = _stub_module("omegaconf")

        class DictConfig(dict):
            pass

        class OmegaConf:
            @staticmethod
            def create(x=None):
                return x or {}

            @staticmethod
            def to_container(x, **kw):
                return dict(x)

        om.DictConfig = DictConfig
        om.OmegaConf = OmegaConf
        sys.modules["omegaconf"] = om

    if "pytorch_lightning" not in sys.modules:
        pl = _stub_module("pytorch_lightning")

        class _HParams(dict):
            """dict + attribute access (what the reference touches on
            ``self.hparams``: attributes, ``.get`` and ``in``)."""

            def __getattr__(self, k):
                try:
                    return self[k]
                except KeyError:
                    raise AttributeError(k)

        class LightningModule(nn.Module):
            """Just enough LightningModule for BaseModel/BaseDiffusion:
            frame-inspecting ``save_hyperparameters`` + attribute-style
            ``hparams`` (what the reference actually touches)."""

            def save_hyperparameters(self, *args, ignore=None, **kw):
                # Lightning walks the whole __init__ call chain, so a call
                # from a BASE __init__ still captures SUBCLASS ctor args
                # (e.g. InterpolationExperiment.stack_window_to_channel_dim
                # is read via hparams inside BaseExperiment.__init__).
                f = inspect.currentframe().f_back
                captured = {}
                while f is not None and f.f_code.co_name == "__init__":
                    code = f.f_code
                    arg_names = code.co_varnames[1 : code.co_argcount]
                    frame_args = {n: f.f_locals.get(n) for n in arg_names}
                    frame_args.update(f.f_locals.get("kwargs") or {})
                    captured.update(frame_args)  # outer (subclass) wins
                    f = f.f_back
                for ig in ignore or []:
                    captured.pop(ig, None)
                merged = dict(getattr(self, "_stub_hparams", {}))
                merged.update(captured)
                object.__setattr__(self, "_stub_hparams", merged)

            @property
            def hparams(self):
                return _HParams(getattr(self, "_stub_hparams", {}))

            @property
            def device(self):
                import torch as _torch

                return _torch.device("cpu")

        pl.LightningModule = LightningModule

        class LightningDataModule:
            def __init__(self, *a, **k):
                pass

        pl.LightningDataModule = LightningDataModule

        class Callback:  # base class only (wandb_callbacks subclasses it)
            pass

        class Trainer:  # referenced in type annotations only
            pass

        pl.Callback = Callback
        pl.Trainer = Trainer
        pl.__path__ = []  # mark as package so pl.callbacks resolves
        cb_mod = _stub_module("pytorch_lightning.callbacks")

        class ModelCheckpoint(Callback):
            pass

        cb_mod.ModelCheckpoint = ModelCheckpoint
        pl.callbacks = cb_mod
        sys.modules["pytorch_lightning.callbacks"] = cb_mod
        lg_mod = _stub_module("pytorch_lightning.loggers")

        class WandbLogger:
            pass

        lg_mod.WandbLogger = WandbLogger
        pl.loggers = lg_mod
        sys.modules["pytorch_lightning.loggers"] = lg_mod
        util = _stub_module("pytorch_lightning.utilities")
        util.__path__ = []  # mark as package so submodule imports resolve

        def rank_zero_only(fn):
            return fn

        rank_zero_only.rank = 0
        util.rank_zero_only = rank_zero_only
        pl.utilities = util
        pl_types = _stub_module("pytorch_lightning.utilities.types")
        pl_types.EVAL_DATALOADERS = object
        pl_types.TRAIN_DATALOADERS = object
        pl_types.STEP_OUTPUT = object
        util.types = pl_types
        sys.modules["pytorch_lightning"] = pl
        sys.modules["pytorch_lightning.utilities"] = util
        sys.modules["pytorch_lightning.utilities.types"] = pl_types

    if "tensordict" not in sys.modules:
        td = _stub_module("tensordict")

        class TensorDict(dict):
            pass

        td.TensorDict = TensorDict
        sys.modules["tensordict"] = td

    if "wandb" not in sys.modules:
        wb = _stub_module("wandb")
        wb.run = None
        sys.modules["wandb"] = wb

    if "torchmetrics" not in sys.modules:
        tm = _stub_module("torchmetrics")

        class MeanSquaredError(nn.Module):
            def forward(self, a, b):
                return ((a - b) ** 2).mean()

            def update(self, *a, **k):
                pass

            def compute(self):
                raise NotImplementedError

            def reset(self):
                pass

        tm.MeanSquaredError = MeanSquaredError
        tm.Metric = nn.Module
        sys.modules["torchmetrics"] = tm

    if "xskillscore" not in sys.modules:
        xs = _stub_module("xskillscore")
        xs.__is_stub__ = True  # lets other tests detect this isn't the real lib

        def crps_ensemble(*a, **k):
            raise NotImplementedError("xskillscore stub")

        xs.crps_ensemble = crps_ensemble
        sys.modules["xskillscore"] = xs

    if "xarray" not in sys.modules:
        try:
            import xarray  # noqa: F401
        except ImportError:
            xr = _stub_module("xarray")
            xr.__is_stub__ = True

            class DataArray:
                def __init__(self, *a, **k):
                    raise NotImplementedError("xarray stub")

            xr.DataArray = DataArray
            xr.Dataset = DataArray
            # permissive: any other attribute (used only in annotations)
            xr.__getattr__ = lambda name: object
            sys.modules["xarray"] = xr


def import_reference(module: str):
    """Import ``src.<module>`` from the reference tree with stubs installed."""
    _install_stubs()
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    return importlib.import_module(module)
