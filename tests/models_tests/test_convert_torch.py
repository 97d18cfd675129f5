"""torchvision-resnet18 weight conversion: numerical parity on random
weights.

Builds a random torchvision-format ``state_dict`` (no download needed),
runs a minimal torch functional twin of the dilated extractor, and checks
the converted flax ``ResNet18Extractor`` produces the same features
(reference pretrained path: ``morefusion/models/resnet.py:7-52``).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from morefusion_tpu.models import ResNet18Extractor  # noqa: E402
from morefusion_tpu.models.convert_torch import (  # noqa: E402
    convert_torchvision_resnet18,
)
from morefusion_tpu.models.resnet import normalize_rgb  # noqa: E402


def _random_state_dict(rng):
    sd = {}

    def conv(key, o, i, k):
        sd[f"{key}.weight"] = torch.tensor(
            rng.normal(0, 0.05, (o, i, k, k)).astype(np.float32)
        )

    def bn(key, c):
        sd[f"{key}.weight"] = torch.tensor(
            rng.uniform(0.5, 1.5, c).astype(np.float32)
        )
        sd[f"{key}.bias"] = torch.tensor(
            rng.normal(0, 0.1, c).astype(np.float32)
        )
        sd[f"{key}.running_mean"] = torch.tensor(
            rng.normal(0, 0.1, c).astype(np.float32)
        )
        sd[f"{key}.running_var"] = torch.tensor(
            rng.uniform(0.5, 1.5, c).astype(np.float32)
        )

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    chans = {1: (64, 64), 2: (64, 128), 3: (128, 256), 4: (256, 512)}
    for layer, (cin, cout) in chans.items():
        for sub in (0, 1):
            key = f"layer{layer}.{sub}"
            conv(f"{key}.conv1", cout, cin if sub == 0 else cout, 3)
            bn(f"{key}.bn1", cout)
            conv(f"{key}.conv2", cout, cout, 3)
            bn(f"{key}.bn2", cout)
            if layer > 1 and sub == 0:
                conv(f"{key}.downsample.0", cout, cin, 1)
                bn(f"{key}.downsample.1", cout)
    return sd


def _torch_bn(x, sd, key):
    return F.batch_norm(
        x,
        sd[f"{key}.running_mean"],
        sd[f"{key}.running_var"],
        sd[f"{key}.weight"],
        sd[f"{key}.bias"],
        training=False,
    )


def _torch_block(h, sd, key, stride=1, dilate=1, down=False):
    idt = h
    o = F.conv2d(
        h, sd[f"{key}.conv1.weight"], stride=stride, padding=dilate,
        dilation=dilate,
    )
    o = F.relu(_torch_bn(o, sd, f"{key}.bn1"))
    o = F.conv2d(
        o, sd[f"{key}.conv2.weight"], padding=dilate, dilation=dilate
    )
    o = _torch_bn(o, sd, f"{key}.bn2")
    if down:
        idt = F.conv2d(h, sd[f"{key}.downsample.0.weight"], stride=stride)
        idt = _torch_bn(idt, sd, f"{key}.downsample.1")
    return F.relu(o + idt)


def _torch_extractor(sd, x):
    """Dilated-eval twin of ResNet18Extractor (stride->dilation in
    res4/res5, matching the flax module's block configuration)."""
    h = F.conv2d(x, sd["conv1.weight"], stride=2, padding=3)
    h = F.relu(_torch_bn(h, sd, "bn1"))
    h = F.max_pool2d(h, 3, 2, 1)
    cfg = [
        ("layer1.0", 1, 1, False), ("layer1.1", 1, 1, False),
        ("layer2.0", 2, 1, True), ("layer2.1", 1, 1, False),
        ("layer3.0", 1, 1, True), ("layer3.1", 1, 2, False),
        ("layer4.0", 1, 1, True), ("layer4.1", 1, 4, False),
    ]
    for key, stride, dilate, down in cfg:
        h = _torch_block(h, sd, key, stride, dilate, down)
    return h


def test_convert_matches_torch_forward():
    import jax

    rng = np.random.RandomState(0)
    sd = _random_state_dict(rng)
    variables = convert_torchvision_resnet18(sd)

    rgb = rng.randint(0, 255, (1, 64, 64, 3)).astype(np.float32)
    out_flax = np.asarray(
        jax.jit(ResNet18Extractor().apply)(variables, rgb)
    )

    x = np.asarray(normalize_rgb(rgb)).transpose(0, 3, 1, 2)
    with torch.no_grad():
        out_torch = _torch_extractor(sd, torch.tensor(x)).numpy()
    out_torch = out_torch.transpose(0, 2, 3, 1)

    assert out_flax.shape == out_torch.shape == (1, 8, 8, 512)
    np.testing.assert_allclose(out_flax, out_torch, atol=1e-2, rtol=1e-3)


def test_convert_tree_matches_init_shapes():
    import jax

    rng = np.random.RandomState(1)
    sd = _random_state_dict(rng)
    converted = convert_torchvision_resnet18(sd)
    init = ResNet18Extractor().init(
        jax.random.PRNGKey(0), np.zeros((1, 32, 32, 3), np.float32)
    )
    conv_shapes = jax.tree_util.tree_map(lambda x: x.shape, converted)
    init_shapes = jax.tree_util.tree_map(lambda x: x.shape, dict(init))
    assert conv_shapes == init_shapes


def test_graft_into_flagship():
    import jax

    from morefusion_tpu.models import SingleView3D
    from morefusion_tpu.models.convert_torch import graft_resnet18

    rng = np.random.RandomState(2)
    sd = _random_state_dict(rng)
    converted = convert_torchvision_resnet18(sd)

    model = SingleView3D(n_fg_class=2, n_point=8, pretrained_resnet18=True)
    B, H, W = 1, 32, 32
    kwargs = dict(
        class_id=np.ones((B,), np.int32),
        rgb=rng.randint(0, 255, (B, H, W, 3)).astype(np.float32),
        pcd=rng.uniform(0.3, 0.8, (B, H, W, 3)).astype(np.float32),
        pitch=np.full((B,), 0.0075, np.float32),
        rng=jax.random.PRNGKey(0),
    )
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), **kwargs)
    grafted = graft_resnet18(variables, converted)
    quat, trans, conf = jax.jit(model.apply)(grafted, **kwargs)
    assert np.isfinite(np.asarray(quat)).all()
    np.testing.assert_allclose(
        np.asarray(grafted["params"]["resnet_extractor"]["Conv_0"]["kernel"]),
        np.asarray(sd["conv1.weight"]).transpose(2, 3, 1, 0),
    )
