"""Native C++ tar reader: parity with Python tarfile + throughput sanity."""

import io
import os
import tarfile
import time

import numpy as np
import pytest

from zigma_tpu.native.tar_reader import NativeTar, available, native_tar_samples

pytestmark = pytest.mark.skipif(not available(),
                                reason="native tar reader did not build")


def _make_tar(path, n=50, payload=2048, longname=False):
    rng = np.random.default_rng(0)
    payloads = {}
    with tarfile.open(path, "w") as tf:
        for i in range(n):
            prefix = ("deep/" * 20) if longname else ""
            for ext in ("latent.npy", "cls_id.cls"):
                name = f"{prefix}{i:06d}.{ext}"
                data = rng.bytes(payload) if ext.endswith("npy") else str(i).encode()
                info = tarfile.TarInfo(name)
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
                payloads[name] = data
    return payloads


class TestNativeTar:
    def test_index_and_read_parity(self, tmp_path):
        path = str(tmp_path / "s.tar")
        payloads = _make_tar(path)
        with NativeTar(path) as tar:
            assert len(tar) == len(payloads)
            for i in range(len(tar)):
                assert tar.read(i) == payloads[tar.name(i)]

    def test_gnu_long_names(self, tmp_path):
        path = str(tmp_path / "long.tar")
        payloads = _make_tar(path, n=5, longname=True)
        with NativeTar(path) as tar:
            names = {tar.name(i) for i in range(len(tar))}
            assert names == set(payloads)

    def test_sample_grouping_matches_tarfile(self, tmp_path):
        from zigma_tpu.data.wds import tar_samples

        path = str(tmp_path / "s.tar")
        _make_tar(path, n=10)
        native = list(native_tar_samples(path))
        assert len(native) == 10
        assert {"__key__", "latent.npy", "cls_id.cls"} <= set(native[0])
        # the public entry point should agree (it prefers the native path)
        public = list(tar_samples(path))
        assert [s["__key__"] for s in public] == [s["__key__"] for s in native]
        assert public[3]["latent.npy"] == native[3]["latent.npy"]

    def test_missing_file_raises(self):
        with pytest.raises(OSError):
            NativeTar("/nonexistent/shard.tar")

    def test_faster_than_tarfile(self, tmp_path):
        """Indexed pread beats tarfile streaming on re-reads (smoke, 2x)."""
        path = str(tmp_path / "big.tar")
        _make_tar(path, n=2000, payload=4096)

        t0 = time.perf_counter()
        n_native = sum(1 for _ in native_tar_samples(path))
        t_native = time.perf_counter() - t0

        def tarfile_pass():
            count = 0
            with tarfile.open(path) as tf:
                for m in tf:
                    if m.isfile():
                        tf.extractfile(m).read()
                        count += 1
            return count

        t0 = time.perf_counter()
        n_py = tarfile_pass()
        t_py = time.perf_counter() - t0
        assert n_native == 2000          # samples
        assert n_py == 2 * n_native      # members (2 per sample)
        # don't be flaky: just require native not slower than python
        assert t_native < t_py * 1.5, (t_native, t_py)


def _pax_record(key, value):
    """PAX 'len key=value\\n' record with self-including length."""
    body = f" {key}={value}\n".encode()
    total = len(body)
    while total != len(body) + len(str(total)):  # fixed point of len prefix
        total = len(body) + len(str(total))
    return str(total).encode() + body


def _raw_header(name, size_field, typeflag=b"0"):
    hdr = bytearray(512)
    hdr[0:len(name)] = name.encode()
    hdr[100:108] = b"0000644\x00"
    hdr[108:116] = b"0000000\x00"
    hdr[116:124] = b"0000000\x00"
    hdr[124:136] = size_field
    hdr[136:148] = b"00000000000\x00"
    hdr[156:157] = typeflag
    hdr[257:263] = b"ustar\x00"
    hdr[148:156] = b"        "
    chksum = sum(hdr)
    hdr[148:156] = f"{chksum:06o}\x00 ".encode()
    return bytes(hdr)


def _pad512(b):
    return b + b"\x00" * ((512 - len(b) % 512) % 512)


class TestPaxSizeOverride:
    def test_pax_size_record_overrides_stale_octal_field(self, tmp_path):
        """Members >= 8 GiB carry their size in a PAX record while the octal
        header field is stale; honoring only the header would desync every
        later offset.  Craft a small archive with a deliberately wrong
        octal field + a correct PAX size."""
        data1 = b"hello-pax-payload"       # real size 17
        data2 = b"after"
        pax_payload = _pax_record("size", len(data1))
        blob = (
            _raw_header("a.pax", b"%011o\x00" % len(pax_payload), b"x")
            + _pad512(pax_payload)
            # octal field LIES (says 0); PAX record holds the real size
            + _raw_header("a.bin", b"00000000000\x00")
            + _pad512(data1)
            + _raw_header("b.bin", b"%011o\x00" % len(data2))
            + _pad512(data2)
            + b"\x00" * 1024
        )
        path = str(tmp_path / "pax.tar")
        open(path, "wb").write(blob)

        # sanity: Python tarfile agrees with the PAX interpretation
        with tarfile.open(path) as tf:
            infos = {m.name: m.size for m in tf.getmembers()}
        assert infos == {"a.bin": len(data1), "b.bin": len(data2)}

        with NativeTar(path) as tar:
            names = {tar.name(i): i for i in range(len(tar))}
            assert set(names) == {"a.bin", "b.bin"}
            assert tar.read(names["a.bin"]) == data1
            assert tar.read(names["b.bin"]) == data2

    def test_malformed_pax_record_does_not_crash(self, tmp_path):
        """A reclen shorter than its own prefix must not underflow."""
        bad = b"2 size=99999\n"  # reclen 2 < prefix length
        blob = (
            _raw_header("bad.pax", b"%011o\x00" % len(bad), b"x")
            + _pad512(bad)
            + _raw_header("ok.bin", b"%011o\x00" % 3)
            + _pad512(b"abc")
            + b"\x00" * 1024
        )
        path = str(tmp_path / "bad.tar")
        open(path, "wb").write(blob)
        with NativeTar(path) as tar:
            names = {tar.name(i): i for i in range(len(tar))}
            assert "ok.bin" in names
            assert tar.read(names["ok.bin"]) == b"abc"
