"""Backbone factory (reference src/models/components/cnn_backbones.py):
name → (module_ctor, feature_dim, interm_feature_dim)."""

from __future__ import annotations

from typing import Any, Callable, Tuple

from medmoe_tpu.models import resnet as _resnet


def _entry(ctor: Callable, feature_dim: int, interm: int):
    def build(**kw) -> Tuple[Any, int, int]:
        return ctor(**kw), feature_dim, interm

    return build


# (feature_dim, interm_feature_dim) per reference cnn_backbones.py:19-100
resnet_18 = _entry(_resnet.ResNet18, 512, 256)
resnet_34 = _entry(_resnet.ResNet34, 512, 256)
resnet_50 = _entry(_resnet.ResNet50, 2048, 1024)
resnet_101 = _entry(_resnet.ResNet101, 2048, 1024)
resnet_152 = _entry(_resnet.ResNet152, 2048, 1024)


def swin(**kw):
    """Swin returns dims (768, 768) (reference cnn_backbones.py:52-55);
    the actual module is built by the vision facade."""
    from medmoe_tpu.models.swin import SwinBackbone, SwinConfig

    return SwinBackbone(SwinConfig()), 768, 768


BACKBONES = {
    "resnet_18": resnet_18,
    "resnet_34": resnet_34,
    "resnet_50": resnet_50,
    "resnet_101": resnet_101,
    "resnet_152": resnet_152,
    "swin": swin,
}
