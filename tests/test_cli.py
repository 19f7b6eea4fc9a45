"""CLI surface tests (run.py-parity UX)."""

import os

import pytest

from otti_tpu import cli
from otti_tpu.io import zkif
from tests.test_nizk import toy_instance

AFIRO = "/root/reference/datasets/LP/MPS-small/afiro.mps"


def test_cli_lp_custom_lower_only(tmp_path, capsys):
    rc = cli.main(
        ["--lp", "--custom", AFIRO, "--no-prove", "--cpu", "--out", str(tmp_path)]
    )
    out = capsys.readouterr().out
    assert rc == 0
    assert "oracle optimum -464" in out
    assert "lowered afiro.mps" in out


def test_cli_verify_zkif_roundtrip(tmp_path, capsys):
    shape, vars_, ios = toy_instance()
    base = str(tmp_path / "toy")
    zkif.export_r1cs(shape, vars_, ios, base)
    rc = cli.main(
        [
            "--verify-zkif",
            base + ".zkif",
            base + ".wit.zkif",
            "--cpu",
            "--out",
            str(tmp_path / "out"),
        ]
    )
    out = capsys.readouterr().out
    assert rc == 0
    assert "Verification successful" in out
    # artifacts persisted
    assert os.path.exists(str(tmp_path / "out" / "toy.zkif.meta.json"))
    assert os.path.exists(str(tmp_path / "out" / "toy.zkif.proof.json"))


def test_cli_verify_zkif_snark_mode(tmp_path, capsys):
    """--snark: SPARK-preprocessed proving through the CLI surface."""
    shape, vars_, ios = toy_instance()
    base = str(tmp_path / "toy")
    zkif.export_r1cs(shape, vars_, ios, base)
    rc = cli.main(
        [
            "--verify-zkif",
            base + ".zkif",
            base + ".wit.zkif",
            "--snark",
            "--cpu",
            "--out",
            str(tmp_path / "out"),
        ]
    )
    out = capsys.readouterr().out
    assert rc == 0
    assert "(snark)" in out
    assert "Verification successful" in out
    import json

    with open(str(tmp_path / "out" / "toy.zkif.meta.json")) as f:
        meta = json.load(f)
    assert meta["mode"] == "snark" and meta["verified"]


def test_cli_zk_snark_exclusive(capsys):
    with pytest.raises(SystemExit):
        cli.main(["--lp", "--zk", "--snark"])
    with pytest.raises(SystemExit):
        cli.main(["--lp", "--zk", "--transparent"])


def test_cli_emit_zkif_artifact_triple(tmp_path, capsys):
    """--emit-zkif leaves the reference-format triple per instance
    (run.py:47-49) and the triple re-imports + re-verifies."""
    rc = cli.main(
        [
            "--lp",
            "--custom",
            AFIRO,
            "--transparent",
            "--emit-zkif",
            "--cpu",
            "--out",
            str(tmp_path),
        ]
    )
    assert rc == 0
    base = str(tmp_path / "LP" / "afiro.mps")
    for ext in (".zkif", ".inp.zkif", ".wit.zkif"):
        assert os.path.exists(base + ext), ext
    shape, vars_, inputs = zkif.import_r1cs(
        base + ".zkif", base + ".wit.zkif", base + ".inp.zkif"
    )
    assert shape.is_satisfied(vars_, inputs)


def test_cli_lp_custom_delta_flag(tmp_path, capsys):
    """--delta is a statement parameter (SURVEY.md §5.6): a looser delta
    must still lower + solve; it changes the fixed-point statement."""
    rc = cli.main(
        [
            "--lp",
            "--custom",
            AFIRO,
            "--no-prove",
            "--delta",
            "0.1",
            "--cpu",
            "--out",
            str(tmp_path),
        ]
    )
    out = capsys.readouterr().out
    assert rc == 0
    assert "lowered afiro.mps" in out


def test_cli_help_matrix(capsys):
    rc = cli.main([])
    out = capsys.readouterr().out
    assert rc == 0
    assert "--lp" in out and "--sdp" in out and "--sgd" in out
