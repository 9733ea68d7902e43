"""SAM2 (Hiera) image-encoder checkpoint-import parity (VERDICT r2 Next #7:
sam_b/mobile_sam/**sam2_t**).

Builds the REFERENCE torch SAM2 ImageEncoder (Hiera trunk + FpnNeck, the
exact modules `_build_sam2` assembles — build.py:245-261) at a reduced config
with random weights, imports the state_dict through
`sam2_encoder_state_dict_to_flax`, and asserts our flax encoder reproduces
every Hiera stage map and the stride-16 vision features. Proves a user
dropping an official sam2*.pt in gets the official image embedding.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module", autouse=True)
def ref_path():
    import tests.fixtures.gen_fixtures as gf
    gf.install_stubs()
    yield None
    gf.uninstall_stubs()


def test_sam2_encoder_import_parity():
    import torch

    from ultralytics.models.sam.modules.encoders import (
        FpnNeck as RefFpn,
        Hiera as RefHiera,
        ImageEncoder as RefEnc,
    )

    import jax
    import jax.numpy as jnp

    from ultralytics_pro_tpu.models.sam.import_weights import sam2_encoder_state_dict_to_flax
    from ultralytics_pro_tpu.models.sam.sam2 import FpnNeck, Hiera

    torch.manual_seed(11)
    stages = (1, 1, 2, 1)
    dim = 24
    glob = (3,)
    ref = RefEnc(
        trunk=RefHiera(embed_dim=dim, num_heads=1, stages=stages,
                       global_att_blocks=glob,
                       window_pos_embed_bkg_spatial_size=(14, 14),
                       window_spec=(8, 4, 14, 7)),
        neck=RefFpn(d_model=64, backbone_channel_list=[192, 96, 48, 24],
                    fpn_top_down_levels=[2, 3], fpn_interp_model="nearest"),
        scalp=1,
    ).eval()
    with torch.no_grad():
        for _, p in ref.named_parameters():
            p.add_(torch.randn_like(p) * 0.04)

    x = np.random.default_rng(7).normal(0, 1, (1, 3, 256, 256)).astype(np.float32)
    with torch.no_grad():
        ref_stages = [t.numpy().transpose(0, 2, 3, 1)
                      for t in ref.trunk(torch.from_numpy(x))]
        out = ref(torch.from_numpy(x))
    ref_embed = out["vision_features"].detach().numpy().transpose(0, 2, 3, 1)

    hiera = Hiera(embed_dim=dim, heads=1, stages=stages, windows=(8, 4, 14, 7),
                  global_att=glob)
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    vh = hiera.init(jax.random.PRNGKey(0), xj)
    neck = FpnNeck(d_model=64)
    feats0 = hiera.apply(vh, xj)
    vn = neck.init(jax.random.PRNGKey(1), feats0)

    sd = {k: t.detach().numpy() for k, t in ref.state_dict().items()}
    sd = {f"image_encoder.{k}": v for k, v in sd.items()}
    merged = {"params": {"trunk": vh["params"], "neck": vn["params"]}}
    merged = sam2_encoder_state_dict_to_flax(merged, sd, strict=True)

    ours_stages = hiera.apply({"params": merged["params"]["trunk"]}, xj)
    for i, (a, b) in enumerate(zip(ours_stages, ref_stages)):
        a = np.asarray(a, np.float32)
        assert a.shape == b.shape, (i, a.shape, b.shape)
        err = np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-8)
        assert err < 5e-4, f"trunk stage {i}: rel err {err}"

    embed, _hr = neck.apply({"params": merged["params"]["neck"]}, ours_stages)
    e = np.asarray(embed, np.float32)
    assert e.shape == ref_embed.shape, (e.shape, ref_embed.shape)
    err = np.max(np.abs(e - ref_embed)) / (np.max(np.abs(ref_embed)) + 1e-8)
    assert err < 5e-4, f"vision_features: rel err {err}"
