"""Iceberg runtime jar fetch: integrity verification before anything
reaches a JVM classpath — Maven's published .sha1 always, an optional
out-of-band sha256 pin — and the marker-gated single attempt."""

import hashlib
import io
import os

import iceberg_catalog_migrator_spark.session as S

JAR_BYTES = b"PK\x03\x04 fake-jar-payload " * 64


class _Resp(io.BytesIO):
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def _fake_urlopen(body: bytes, sha1_text: str):
    def opener(url, timeout=None):
        if url.endswith(".sha1"):
            return _Resp(sha1_text.encode())
        return _Resp(body)

    return opener


def _run(monkeypatch, tmp_path, sha1_text, pin=None):
    cache = str(tmp_path / "jars")
    monkeypatch.setattr(S, "ICEBERG_JAR_CACHE", cache)
    monkeypatch.delenv("SPARK_GRAFT_DISABLE_ICEBERG_JAR", raising=False)
    if pin is None:
        monkeypatch.delenv("SPARK_GRAFT_ICEBERG_JAR_SHA256", raising=False)
    else:
        monkeypatch.setenv("SPARK_GRAFT_ICEBERG_JAR_SHA256", pin)
    import urllib.request

    monkeypatch.setattr(
        urllib.request, "urlopen", _fake_urlopen(JAR_BYTES, sha1_text)
    )
    return S._resolve_iceberg_runtime_jar(), cache


def test_jar_fetch_verifies_published_sha1(monkeypatch, tmp_path):
    good = hashlib.sha1(JAR_BYTES).hexdigest()
    path, cache = _run(monkeypatch, tmp_path, f"{good}  jar")
    assert path is not None and os.path.exists(path)
    assert open(path, "rb").read() == JAR_BYTES
    marker = open(path + ".fetch-attempted").read()
    assert marker.startswith("ok sha256=" + hashlib.sha256(JAR_BYTES).hexdigest())


def test_jar_fetch_rejects_corrupted_download(monkeypatch, tmp_path):
    path, cache = _run(monkeypatch, tmp_path, "deadbeef" * 5)
    assert path is None
    # nothing usable cached, no tmp debris, outcome recorded
    leftover = [f for f in os.listdir(cache) if not f.endswith(".fetch-attempted")]
    assert leftover == []
    marker = next(f for f in os.listdir(cache) if f.endswith(".fetch-attempted"))
    assert "sha1 mismatch" in open(os.path.join(cache, marker)).read()


def test_jar_fetch_rejects_sha256_pin_mismatch(monkeypatch, tmp_path):
    good = hashlib.sha1(JAR_BYTES).hexdigest()
    path, cache = _run(monkeypatch, tmp_path, f"{good}  jar", pin="ab" * 32)
    assert path is None
    marker = next(f for f in os.listdir(cache) if f.endswith(".fetch-attempted"))
    assert "sha256 pin mismatch" in open(os.path.join(cache, marker)).read()


def test_jar_fetch_honors_correct_sha256_pin(monkeypatch, tmp_path):
    good = hashlib.sha1(JAR_BYTES).hexdigest()
    pin = hashlib.sha256(JAR_BYTES).hexdigest()
    path, _ = _run(monkeypatch, tmp_path, f"{good}  jar", pin=pin)
    assert path is not None and os.path.exists(path)
