"""XLM-Roberta text tower: parity vs the reference torch module.

Instantiates the reference's own `XLMRoberta`/`XLMRobertaWithHead`
(`MMPL_t2v/wan/modules/xlm_roberta.py`, `clip.py:303-325`) at a tiny
configuration, converts its state dict through our loader, and checks the
JAX forward matches torch (VERDICT r1 item 10: wire + test the text tower).
"""

import importlib.util

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mmpl_tpu.models.xlm_roberta import (convert_xlm_roberta_text,
                                         init_xlm_roberta_head_params,
                                         init_xlm_roberta_params,
                                         masked_mean_pool,
                                         xlm_roberta_encode,
                                         xlm_roberta_with_head)

TINY = dict(vocab_size=64, max_seq_len=24, type_size=1, pad_id=1,
            dim=32, num_heads=4, num_layers=2, eps=1e-5)


def _load_ref_module():
    spec = importlib.util.spec_from_file_location(
        "ref_xlm_roberta",
        "/root/reference/MMPL_t2v/wan/modules/xlm_roberta.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_pair():
    import torch
    ref = _load_ref_module()
    torch.manual_seed(0)
    model = ref.XLMRoberta(vocab_size=TINY["vocab_size"],
                           max_seq_len=TINY["max_seq_len"],
                           type_size=1, pad_id=1, dim=TINY["dim"],
                           num_heads=TINY["num_heads"],
                           num_layers=TINY["num_layers"],
                           post_norm=True, dropout=0.0, eps=TINY["eps"])
    model.eval()

    # head as in clip.py:303-313 (bias-free mid projection)
    import torch.nn as nn
    out_dim = 16
    mid = (TINY["dim"] + out_dim) // 2
    head = nn.Sequential(nn.Linear(TINY["dim"], mid, bias=False), nn.GELU(),
                         nn.Linear(mid, out_dim, bias=False))
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    sd.update({f"head.{i}.weight": p.weight.detach().numpy()
               for i, p in ((0, head[0]), (2, head[2]))})
    return model, head, sd


def test_backbone_parity(ref_pair):
    import torch
    model, _, sd = ref_pair
    params, _ = convert_xlm_roberta_text(sd, TINY)
    ids = np.array([[0, 5, 9, 23, 2, 1, 1, 1],
                    [0, 40, 2, 1, 1, 1, 1, 1]], np.int32)
    with torch.no_grad():
        want = model(torch.from_numpy(ids).long()).numpy()
    got = np.asarray(xlm_roberta_encode(params, jnp.asarray(ids), TINY))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_with_head_parity(ref_pair):
    import torch
    model, head, sd = ref_pair
    params, head_p = convert_xlm_roberta_text(sd, TINY)
    ids = np.array([[0, 7, 3, 2, 1, 1]], np.int32)
    with torch.no_grad():
        x = model(torch.from_numpy(ids).long())
        mask = torch.from_numpy(ids != 1).unsqueeze(-1).to(x)
        pooled = (x * mask).sum(dim=1) / mask.sum(dim=1)
        want = head(pooled).numpy()
    got = np.asarray(xlm_roberta_with_head(params, head_p,
                                           jnp.asarray(ids), TINY))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_init_shapes_roundtrip():
    params = init_xlm_roberta_params(jax.random.PRNGKey(0), TINY)
    head = init_xlm_roberta_head_params(jax.random.PRNGKey(1), TINY["dim"],
                                        16)
    ids = jnp.asarray([[0, 5, 2, 1]], jnp.int32)
    out = xlm_roberta_with_head(params, head, ids, TINY)
    assert out.shape == (1, 16)
    pooled = masked_mean_pool(xlm_roberta_encode(params, ids, TINY), ids)
    assert pooled.shape == (1, TINY["dim"])
