"""monai get_act_layer / get_norm_layer for the names the reference uses."""

import torch.nn as nn

_ACTS = {
    "relu": nn.ReLU,
    "leakyrelu": nn.LeakyReLU,
    "prelu": nn.PReLU,
    "gelu": nn.GELU,
    "sigmoid": nn.Sigmoid,
}

_NORMS_2D = {
    "batch": nn.BatchNorm2d,
    "instance": nn.InstanceNorm2d,
}


def _split(name):
    if isinstance(name, (tuple, list)):
        return str(name[0]).lower(), dict(name[1]) if len(name) > 1 else {}
    return str(name).lower(), {}


def get_act_layer(name):
    act, kwargs = _split(name)
    return _ACTS[act](**kwargs)


def get_norm_layer(name, spatial_dims=1, channels=1):
    norm, kwargs = _split(name)
    assert spatial_dims == 2, "stub covers 2D only"
    return _NORMS_2D[norm](channels, **kwargs)
