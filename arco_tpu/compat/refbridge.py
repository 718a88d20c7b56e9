"""Run the REFERENCE implementation (torch, /root/reference/code) on CPU so
parity harnesses can compare it against arco_tpu on identical inputs.

The reference assumes CUDA (bare ``.cuda()`` calls throughout, e.g.
train_arco_2d.py:280-282, loss_helper_3d.py:418) and a conda env with
torchvision / efficientnet_pytorch / yacs (environment.yml) that this image
does not ship. This module provides:

- ``install_stubs()``: registers minimal in-memory stand-ins for the missing
  third-party packages. The torchvision functional subset is implemented
  faithfully (PIL semantics incl. the uint8 quantization of
  ``to_pil_image`` on float tensors — the reference's aug path really does
  round images to 8 bits, augment.py:221-227) because the trajectory
  harness's reference arm depends on it. Everything else (efficientnet,
  yacs) only needs to satisfy imports for model files the harness never
  instantiates.
- ``patch_cuda()``: makes ``Tensor.cuda`` / ``Module.cuda`` identity ops so
  the reference code runs on CPU unmodified.
- ``import_ref(name)``: imports a reference module by dotted name with the
  stubs installed and ``/root/reference/code`` on sys.path.

Nothing here is imported by the framework's production code paths — it is
test/benchmark infrastructure only.
"""

from __future__ import annotations

import importlib
import os
import sys
import types

REF_ROOT = os.environ.get("ARCO_REF_ROOT", "/root/reference/code")

_installed = False


def reference_available() -> bool:
    return os.path.isdir(REF_ROOT)


# ---------------------------------------------------------------------------
# torchvision stub (faithful functional subset)
# ---------------------------------------------------------------------------

def _build_torchvision():
    import numpy as np
    import torch
    from PIL import Image, ImageEnhance

    tv = types.ModuleType("torchvision")
    transforms = types.ModuleType("torchvision.transforms")
    functional = types.ModuleType("torchvision.transforms.functional")
    models = types.ModuleType("torchvision.models")
    densenet = types.ModuleType("torchvision.models.densenet")
    resnet = types.ModuleType("torchvision.models.resnet")

    class InterpolationMode:
        NEAREST = Image.NEAREST
        BILINEAR = Image.BILINEAR
        BICUBIC = Image.BICUBIC

    def to_pil_image(pic, mode=None):
        # torchvision semantics: float tensors are scaled by 255 and cast to
        # uint8 (unless mode='F'); single channel -> 'L'. This quantization
        # is load-bearing: the reference's batch_transform round-trips every
        # image through it (augment.py:221-227).
        if isinstance(pic, torch.Tensor):
            if pic.is_floating_point() and mode != "F":
                pic = pic.mul(255).byte()
            npimg = pic.cpu().numpy()
            if npimg.ndim == 3:
                npimg = np.transpose(npimg, (1, 2, 0))
        else:
            npimg = np.asarray(pic)
        if npimg.ndim == 3 and npimg.shape[2] == 1:
            npimg = npimg[:, :, 0]
        return Image.fromarray(npimg, mode=mode)

    def to_tensor(pic):
        arr = np.asarray(pic)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        t = torch.from_numpy(np.ascontiguousarray(arr.transpose(2, 0, 1)))
        if t.dtype == torch.uint8:
            return t.float().div(255.0)
        return t.float()

    def resize(img, size, interpolation=Image.BILINEAR):
        # size is (h, w) in torchvision; PIL takes (w, h)
        if isinstance(size, int):
            w, h = img.size
            short, other = (h, w) if h < w else (w, h)
            ratio = size / short
            size = (int(round(other * ratio)), size) if h < w \
                else (size, int(round(other * ratio)))
        return img.resize((size[1], size[0]), interpolation)

    def pad(img, padding, fill=0, padding_mode="constant"):
        left, top, right, bottom = padding
        arr = np.asarray(img)
        pads = [(top, bottom), (left, right)] + \
            [(0, 0)] * (arr.ndim - 2)
        if padding_mode == "reflect":
            out = np.pad(arr, pads, mode="reflect")
        else:
            out = np.pad(arr, pads, mode="constant", constant_values=fill)
        return Image.fromarray(out, mode=img.mode)

    def crop(img, i, j, h, w):
        return img.crop((j, i, j + w, i + h))

    def hflip(img):
        return img.transpose(Image.FLIP_LEFT_RIGHT)

    def adjust_brightness(img, factor):
        return ImageEnhance.Brightness(img).enhance(factor)

    def adjust_contrast(img, factor):
        return ImageEnhance.Contrast(img).enhance(factor)

    def adjust_saturation(img, factor):
        return ImageEnhance.Color(img).enhance(factor)

    def adjust_hue(img, factor):
        if img.mode in {"L", "1", "I", "F"}:
            return img  # torchvision: hue is a no-op on grayscale
        h, s, v = img.convert("HSV").split()
        np_h = np.asarray(h, dtype=np.uint8)
        np_h = (np_h.astype(np.int16)
                + int(factor * 255)).astype(np.uint8)
        return Image.merge("HSV", (Image.fromarray(np_h, "L"), s, v)) \
            .convert(img.mode)

    for fn in (to_pil_image, to_tensor, resize, pad, crop, hflip,
               adjust_brightness, adjust_contrast, adjust_saturation,
               adjust_hue):
        setattr(functional, fn.__name__, fn)
    functional.InterpolationMode = InterpolationMode

    class Compose:
        def __init__(self, ts):
            self.transforms = ts

        def __call__(self, x):
            for t in self.transforms:
                x = t(x)
            return x

    class RandomCrop:
        def __init__(self, size):
            self.size = size

        @staticmethod
        def get_params(img, output_size):
            w, h = img.size
            th, tw = output_size
            if w == tw and h == th:
                return 0, 0, h, w
            i = torch.randint(0, h - th + 1, size=(1,)).item()
            j = torch.randint(0, w - tw + 1, size=(1,)).item()
            return i, j, th, tw

    class ColorJitter:
        """Tuple-range constructor + randperm application order, mirroring
        torchvision 0.10 (the version environment.yml pins)."""

        def __init__(self, brightness=0, contrast=0, saturation=0, hue=0):
            self.brightness = self._check(brightness)
            self.contrast = self._check(contrast)
            self.saturation = self._check(saturation)
            self.hue = self._check(hue, center=0.0)

        @staticmethod
        def _check(v, center=1.0):
            if isinstance(v, (tuple, list)):
                return tuple(v)
            if v == 0:
                return None
            return (max(0.0, center - v), center + v)

        def __call__(self, img):
            fn_idx = torch.randperm(4)
            b = None if self.brightness is None else float(
                torch.empty(1).uniform_(*self.brightness))
            c = None if self.contrast is None else float(
                torch.empty(1).uniform_(*self.contrast))
            s = None if self.saturation is None else float(
                torch.empty(1).uniform_(*self.saturation))
            hu = None if self.hue is None else float(
                torch.empty(1).uniform_(*self.hue))
            for fi in fn_idx:
                if fi == 0 and b is not None:
                    img = adjust_brightness(img, b)
                elif fi == 1 and c is not None:
                    img = adjust_contrast(img, c)
                elif fi == 2 and s is not None:
                    img = adjust_saturation(img, s)
                elif fi == 3 and hu is not None:
                    img = adjust_hue(img, hu)
            return img

    class GaussianBlur:
        def __init__(self, kernel_size, sigma=(0.1, 2.0)):
            self.kernel_size = kernel_size
            self.sigma = sigma

        def __call__(self, img):
            from PIL import ImageFilter
            s = float(torch.empty(1).uniform_(*self.sigma)) \
                if isinstance(self.sigma, (tuple, list)) else self.sigma
            return img.filter(ImageFilter.GaussianBlur(radius=s))

    class RandomResizedCrop:  # import-satisfying only (dataset.py:8)
        def __init__(self, *a, **k):  # pragma: no cover
            raise NotImplementedError

    class ToTensor:
        def __call__(self, pic):
            return to_tensor(pic)

    transforms.Compose = Compose
    transforms.RandomCrop = RandomCrop
    transforms.RandomResizedCrop = RandomResizedCrop
    transforms.ColorJitter = ColorJitter
    transforms.GaussianBlur = GaussianBlur
    transforms.ToTensor = ToTensor
    transforms.InterpolationMode = InterpolationMode
    transforms.functional = functional
    # real torchvision's `from torchvision.transforms import *` also binds
    # the name `transforms` (the .transforms submodule) — augment.py:17
    # relies on it for transforms.RandomCrop/ColorJitter
    transforms.transforms = transforms
    tv.transforms = transforms
    tv.models = models
    utils_mod = types.ModuleType("torchvision.utils")

    def make_grid(*a, **k):  # pragma: no cover
        raise NotImplementedError

    utils_mod.make_grid = make_grid
    tv.utils = utils_mod

    import torch.nn as nn

    class _Placeholder(nn.Module):
        pass

    densenet.DenseNet = _Placeholder
    resnet.BasicBlock = _Placeholder
    resnet.Bottleneck = _Placeholder
    resnet.ResNet = _Placeholder
    models.densenet = densenet
    models.resnet = resnet

    return {
        "torchvision": tv,
        "torchvision.transforms": transforms,
        "torchvision.transforms.functional": functional,
        "torchvision.models": models,
        "torchvision.models.densenet": densenet,
        "torchvision.models.resnet": resnet,
        "torchvision.utils": utils_mod,
    }


def _build_efficientnet_pytorch():
    import torch.nn as nn

    pkg = types.ModuleType("efficientnet_pytorch")
    utils = types.ModuleType("efficientnet_pytorch.utils")

    class EfficientNet(nn.Module):
        """Import-satisfying placeholder; net_factory's 'efficient_unet'
        path would need the real package (environment.yml:pip)."""

        def __init__(self, *a, **k):  # pragma: no cover
            raise NotImplementedError(
                "efficientnet_pytorch is stubbed in the parity harness")

    def get_model_params(*a, **k):  # pragma: no cover
        raise NotImplementedError

    class _UrlMap(dict):
        def __missing__(self, key):
            return ""

    pkg.EfficientNet = EfficientNet
    utils.get_model_params = get_model_params
    utils.url_map = _UrlMap()
    pkg.utils = utils
    return {"efficientnet_pytorch": pkg,
            "efficientnet_pytorch.utils": utils}


def _build_yacs():
    pkg = types.ModuleType("yacs")
    config = types.ModuleType("yacs.config")

    class CfgNode(dict):
        """Attribute-access dict with the yacs calls networks/config.py
        makes at import time (clone/freeze/defrost/merge)."""

        def __init__(self, *a, **k):
            super().__init__(*a, **k)
            self.__dict__["_frozen"] = False

        def __getattr__(self, name):
            try:
                return self[name]
            except KeyError as e:
                raise AttributeError(name) from e

        def __setattr__(self, name, value):
            self[name] = value

        def clone(self):
            out = CfgNode()
            for k, v in self.items():
                out[k] = v.clone() if isinstance(v, CfgNode) else v
            return out

        def freeze(self):
            self.__dict__["_frozen"] = True

        def defrost(self):
            self.__dict__["_frozen"] = False

        def merge_from_file(self, path):  # pragma: no cover
            import yaml
            with open(path) as f:
                data = yaml.safe_load(f)
            self._merge(data or {})

        def _merge(self, data):  # pragma: no cover
            for k, v in data.items():
                if isinstance(v, dict) and isinstance(self.get(k), CfgNode):
                    self[k]._merge(v)
                else:
                    self[k] = v

        def merge_from_list(self, lst):  # pragma: no cover
            for k, v in zip(lst[0::2], lst[1::2]):
                node, *rest = k.split(".")
                cur = self
                for part in [node] + rest[:-1] if rest else []:
                    cur = cur[part]
                cur[rest[-1] if rest else node] = v

    config.CfgNode = CfgNode
    pkg.config = config
    return {"yacs": pkg, "yacs.config": config}


def _build_batchgenerators():
    pkg = types.ModuleType("batchgenerators")
    augs = types.ModuleType("batchgenerators.augmentations")
    utils = types.ModuleType("batchgenerators.augmentations.utils")

    def pad_nd_image(*a, **k):  # pragma: no cover
        raise NotImplementedError(
            "batchgenerators is stubbed in the parity harness")

    utils.pad_nd_image = pad_nd_image
    augs.utils = utils
    pkg.augmentations = augs
    return {"batchgenerators": pkg,
            "batchgenerators.augmentations": augs,
            "batchgenerators.augmentations.utils": utils}


def _build_medpy():
    """medpy.metric backed by arco_tpu's own scipy implementations (already
    golden-tested against medpy's definitions in tests/test_data_eval.py),
    so reference eval code computes real numbers, not errors."""
    from arco_tpu.utils import metrics as _m

    pkg = types.ModuleType("medpy")
    metric = types.ModuleType("medpy.metric")
    binary = types.ModuleType("medpy.metric.binary")
    for name in ("dc", "jc", "hd95", "asd"):
        setattr(binary, name, getattr(_m, name))
        setattr(metric, name, getattr(_m, name))
    metric.binary = binary
    pkg.metric = metric
    return {"medpy": pkg, "medpy.metric": metric,
            "medpy.metric.binary": binary}


def _build_skimage():
    """skimage.measure backed by scipy.ndimage. The reference's call sites
    (dataloaders/utils.py:199-208 post_processing, test_util.py:11-16
    getLargestCC) need measure.label with return_num and
    measure.regionprops' .area — provided here with skimage's DEFAULT
    full connectivity (ndim-connectivity, i.e. a ones((3,)*ndim)
    structure; scipy's own default is 1-connectivity, which would split
    diagonally-touching components skimage merges)."""
    import types

    import numpy as _np
    from scipy import ndimage as _ndi

    pkg = types.ModuleType("skimage")
    measure = types.ModuleType("skimage.measure")

    def label(x, return_num=False, connectivity=None, **k):
        x = _np.asarray(x)
        conn = connectivity if connectivity is not None else x.ndim
        structure = _ndi.generate_binary_structure(x.ndim, conn)
        out, num = _ndi.label(x, structure=structure)
        return (out, num) if return_num else out

    class _Region:
        def __init__(self, lab, i):
            self.label = i
            self.area = int((lab == i).sum())

    def regionprops(lab, **k):
        lab = _np.asarray(lab)
        return [_Region(lab, i) for i in range(1, int(lab.max()) + 1)]

    measure.label = label
    measure.regionprops = regionprops
    pkg.measure = measure
    return {"skimage": pkg, "skimage.measure": measure}


def install_stubs():
    """Register stand-ins for packages the reference imports but this image
    lacks. Idempotent; never overwrites a real installed package."""
    global _installed
    if _installed:
        return
    builders = {
        "torchvision": _build_torchvision,
        "efficientnet_pytorch": _build_efficientnet_pytorch,
        "yacs": _build_yacs,
        "batchgenerators": _build_batchgenerators,
        "medpy": _build_medpy,
        "skimage": _build_skimage,
    }
    for root, build in builders.items():
        try:
            importlib.import_module(root)
            continue  # real package present
        except ImportError:
            pass
        for name, mod in build().items():
            sys.modules.setdefault(name, mod)
    _installed = True


def patch_cuda():
    """Identity-shim .cuda() so reference code runs on CPU torch.

    AdvMorph additionally binds torch.device('cuda') when use_gpu=True
    (adv_morph.py:33-34); harnesses that exercise it must construct it with
    use_gpu=False or rebind augment.AdvMorph (see trajectory harness)."""
    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    if not torch.cuda.is_available():
        torch.cuda.empty_cache = lambda: None
        torch.cuda.manual_seed = lambda *a, **k: None
        torch.cuda.manual_seed_all = lambda *a, **k: None


def import_ref(name: str, argv=None):
    """Import a reference module by dotted name (e.g. 'loss_helper_3d',
    'model_2D', 'tps.rand_tps', 'train_arco_2d').

    argv: replacement sys.argv for modules that parse flags at import time
    (train_arco_2d.py:89). Defaults to the bare program name so the
    argparse defaults apply.
    """
    if not reference_available():
        raise RuntimeError(f"reference tree not found at {REF_ROOT}")
    install_stubs()
    patch_cuda()
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    old_argv = sys.argv
    sys.argv = list(argv) if argv is not None else [old_argv[0]]
    try:
        return importlib.import_module(name)
    finally:
        sys.argv = old_argv
