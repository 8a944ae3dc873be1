"""Offline smoke test of ``scripts/checkpoint_parity.py`` plumbing.

The real released checkpoints need egress, so this exercises every stage of
the harness — cache-path resolution, torch state-dict loading, conversion,
JAX forward on the exact reference fixture inputs, and the torch-reference
cosine cross-check — against a locally-saved random-init checkpoint in the
reference's own state-dict layout (VERDICT round 3, next-round item 8)."""

import sys
from pathlib import Path

import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tests.reference_compat import import_reference

import_reference()


@pytest.mark.slow
def test_harness_plumbing_with_local_fake_checkpoint(tmp_path):
    from torchmultimodal.models.clip import model as torch_clip

    from scripts.checkpoint_parity import run_variant

    torch.manual_seed(0)
    ref = torch_clip.clip_vit_b32(False)
    ckpt = tmp_path / "clip_vit_b32_fake.pt"
    torch.save(ref.state_dict(), str(ckpt))

    # expected=() skips the published-mean assertion (random weights), but
    # the cosine cross-check against the torch model MUST hold — that is the
    # full conversion + numerics path the real run uses.
    res = run_variant("vit_b32", checkpoint=str(ckpt), expected=())
    assert res["ok"], res["failures"]
    assert res["cosine_image"] > 0.999 and res["cosine_text"] > 0.999
    assert res["shape"] == [1, 512]


def test_harness_cli_reports_failure_without_network(tmp_path, capsys, monkeypatch):
    """With no cached checkpoint and no egress the CLI must fail cleanly
    (JSON line per variant, non-zero exit), not crash."""
    from scripts.checkpoint_parity import main

    # point the cache at an empty dir so no ambient cache can satisfy it
    monkeypatch.setenv("MMTPU_CACHE_DIR", str(tmp_path))
    monkeypatch.delenv("MMTPU_ALLOW_DOWNLOAD", raising=False)
    rc = main(["--variants", "vit_b32", "--skip-torch-ref"])
    assert rc == 1
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    import json

    rec = json.loads(out[0])
    assert rec["variant"] == "vit_b32" and rec["ok"] is False


def test_fixture_inputs_match_reference_draw_order():
    """The fixture replication must reproduce the reference's exact draws —
    seed 0, four randn images then the randint text (checkpoint test
    fixture, reference tests/models/clip/test_checkpoint.py:14-22)."""
    from scripts.checkpoint_parity import fixture_inputs

    images, text = fixture_inputs()

    torch.manual_seed(0)
    exp224 = torch.randn(1, 3, 224, 224)
    exp288 = torch.randn(1, 3, 288, 288)
    exp384 = torch.randn(1, 3, 384, 384)
    exp448 = torch.randn(1, 3, 448, 448)
    exp_text = torch.randint(0, 49408, (1, 77))

    assert torch.equal(images[224], exp224)
    assert torch.equal(images[288], exp288)
    assert torch.equal(images[384], exp384)
    assert torch.equal(images[448], exp448)
    assert torch.equal(text, exp_text)
