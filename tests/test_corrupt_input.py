"""Corrupt-input robustness: both BAM codecs must fail with clean Python
exceptions (never crash the process), and the caller must surface the error
with context rather than hanging or emitting a partial VCF."""

import os

import pytest

from hello_tpu import native, sim
from hello_tpu.io.bam import BamReader
from hello_tpu.io.fasta import FastaFile


@pytest.fixture(scope="module")
def corrupt_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("corrupt")
    ds = sim.make_dataset(str(d / "ok"), ref_length=4000, num_variants=6,
                          coverage=20, read_length=100, seed=3)
    data = open(ds.bams["illumina"], "rb").read()
    (d / "trunc.bam").write_bytes(data[:len(data) // 3])
    (d / "garbage.bam").write_bytes(b"not a bam file" * 100)
    (d / "empty.bam").write_bytes(b"")
    # valid BGZF/BAM header, corrupted later block payload
    broken = bytearray(data)
    broken[len(broken) // 2] ^= 0xFF
    (d / "bitflip.bam").write_bytes(bytes(broken))
    return d, ds


@pytest.mark.skipif(not native.available(), reason="native engine not built")
@pytest.mark.parametrize("name", ["trunc.bam", "garbage.bam", "empty.bam",
                                  "bitflip.bam"])
def test_native_codec_raises_cleanly(corrupt_dir, name):
    d, _ds = corrupt_dir
    with pytest.raises((OSError, ValueError)):
        b = native.NativeBam(str(d / name))
        assert b.num_reads >= 0    # attribute, set at open


@pytest.mark.parametrize("name", ["trunc.bam", "garbage.bam", "empty.bam",
                                  "bitflip.bam"])
def test_python_codec_raises_cleanly(corrupt_dir, name):
    import zlib

    d, _ds = corrupt_dir
    with pytest.raises((OSError, ValueError, EOFError, zlib.error)):
        r = BamReader(str(d / name))
        list(r.fetch("chrS", 0, 10 ** 9))


def test_caller_surfaces_corrupt_bam(corrupt_dir):
    """call_region on a corrupt BAM raises with context (the share-nothing
    recovery model: the shard fails, the driver reports it)."""
    from hello_tpu.pipeline.call import call_region
    d, ds = corrupt_dir
    ref = FastaFile(ds.fasta)

    class NeverScorer:
        class _Model:
            hybrid = False
        model = _Model()

        def __call__(self, batch):  # pragma: no cover - must not be reached
            raise AssertionError("scorer reached with corrupt input")

    with pytest.raises(Exception):
        call_region([str(d / "trunc.bam")], ref, ds.chromosome, 0, 4000,
                    NeverScorer())
