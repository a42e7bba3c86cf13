"""Torch->flax weight conversion: numerical parity of the ResNet trunk."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")


class _TorchBasicBlock(torch.nn.Module):
    """resnet18 BasicBlock replica (torchvision not installed here)."""

    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(cout)
        self.conv2 = torch.nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = torch.nn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = torch.nn.Sequential(
                torch.nn.Conv2d(cin, cout, 1, stride, bias=False),
                torch.nn.BatchNorm2d(cout))

    def forward(self, x):
        out = torch.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        identity = x if self.downsample is None else self.downsample(x)
        return torch.relu(out + identity)


class _TorchTrunk(torch.nn.Module):
    """conv1..layer3 of resnet18 with torchvision state-dict naming."""

    def __init__(self):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(64)
        self.maxpool = torch.nn.MaxPool2d(3, 2, 1)
        self.layer1 = torch.nn.Sequential(_TorchBasicBlock(64, 64),
                                          _TorchBasicBlock(64, 64))
        self.layer2 = torch.nn.Sequential(_TorchBasicBlock(64, 128, 2),
                                          _TorchBasicBlock(128, 128))
        self.layer3 = torch.nn.Sequential(_TorchBasicBlock(128, 256, 2),
                                          _TorchBasicBlock(256, 256))

    def forward(self, x):
        y = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
        return self.layer3(self.layer2(self.layer1(y)))


def test_resnet18_trunk_parity(rng):
    """A randomly initialized torch resnet18 trunk and our converted flax
    encoder produce identical features through layer3."""
    from dro_sfm_tpu.models.encoder import ResNetEncoder
    from tools.convert_torch_weights import convert_resnet18_encoder

    torch.manual_seed(0)
    tnet = _TorchTrunk()
    # randomize BN stats so the test exercises them
    for m in tnet.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.1)
            m.running_var.uniform_(0.5, 1.5)
    tnet.eval()
    state_dict = {k: v.detach().numpy() for k, v in tnet.state_dict().items()
                  if "num_batches" not in k}
    tree = convert_resnet18_encoder(state_dict)

    enc = ResNetEncoder(out_chs=128, stride=8)
    x = rng.uniform(size=(2, 64, 96, 3)).astype(np.float32)

    # Init to get the full structure, then graft the converted trunk.
    variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    params = dict(variables["params"])
    stats = dict(variables.get("batch_stats", {}))
    params.update(tree["params"])
    stats.update(tree["batch_stats"])

    ours = enc.apply({"params": params, "batch_stats": stats},
                     jnp.asarray(x), train=False, return_trunk=True)

    with torch.no_grad():
        t = torch.from_numpy(x).permute(0, 3, 1, 2)
        expected = tnet(t).permute(0, 2, 3, 1).numpy()

    np.testing.assert_allclose(np.asarray(ours), expected,
                               rtol=1e-4, atol=1e-4)


def test_resnet18_multi_image_conv1():
    """conv1 replication for 2-image input matches the reference recipe
    (`extractor.py:58`: concat / num_images)."""
    from tools.convert_torch_weights import convert_resnet18_encoder
    rng = np.random.default_rng(0)
    sd = {"conv1.weight": rng.normal(size=(64, 3, 7, 7)).astype(np.float32),
          "bn1.weight": np.ones(64, np.float32),
          "bn1.bias": np.zeros(64, np.float32),
          "bn1.running_mean": np.zeros(64, np.float32),
          "bn1.running_var": np.ones(64, np.float32)}
    for li in (1, 2, 3):
        for bi in (0, 1):
            for c in ("conv1", "conv2"):
                sd[f"layer{li}.{bi}.{c}.weight"] = rng.normal(
                    size=(64, 64, 3, 3)).astype(np.float32)
            for b in ("bn1", "bn2"):
                sd[f"layer{li}.{bi}.{b}.weight"] = np.ones(64, np.float32)
                sd[f"layer{li}.{bi}.{b}.bias"] = np.zeros(64, np.float32)
                sd[f"layer{li}.{bi}.{b}.running_mean"] = np.zeros(64, np.float32)
                sd[f"layer{li}.{bi}.{b}.running_var"] = np.ones(64, np.float32)
    tree = convert_resnet18_encoder(sd, num_input_images=2)
    k = tree["params"]["conv1"]["kernel"]
    assert k.shape == (7, 7, 6, 64)
    np.testing.assert_allclose(k[..., :3, :], k[..., 3:, :])
    np.testing.assert_allclose(
        k[..., :3, :] * 2,
        np.transpose(sd["conv1.weight"], (2, 3, 1, 0)))
