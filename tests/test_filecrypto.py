"""File-encryption chain: the reference's [IV][AES-256-CBC] envelope
with scrypt key derivation (fileDBI.js:346-360, yadamu.js:279-293),
standalone (CLI ENCRYPT/DECRYPT) and layered under the monolithic
export (data -> gzip -> cipher -> IV -> file)."""

from __future__ import annotations

import gzip
import io
import os

import pytest

from yadamu___yet_another_data_migration_utility_spark.sources.filecrypto import (
    IV_LENGTH,
    CipherReader,
    CipherWriter,
    decrypt_file,
    derive_key,
    encrypt_file,
)


def test_derive_key_is_node_scrypt_shape():
    k = derive_key("secret passphrase")
    assert isinstance(k, bytes) and len(k) == 32
    assert k == derive_key("secret passphrase")  # deterministic
    assert k != derive_key("other passphrase")
    assert k != derive_key("secret passphrase", salt="different salt")


def test_encrypt_decrypt_file_roundtrip(tmp_path):
    src = tmp_path / "plain.bin"
    payload = os.urandom(100_000) + b"tail-not-block-aligned"
    src.write_bytes(payload)
    key = derive_key("pw")
    enc = str(tmp_path / "enc.bin")
    dec = str(tmp_path / "dec.bin")
    encrypt_file(str(src), enc, key)

    blob = open(enc, "rb").read()
    # wire format: 16-byte IV prefix + PKCS7-padded CBC ciphertext
    assert len(blob) == IV_LENGTH + (len(payload) // 16 + 1) * 16
    assert payload[:64] not in blob  # nothing readable in the clear

    decrypt_file(enc, dec, key)
    assert open(dec, "rb").read() == payload

    # wrong key -> padding failure (CBC carries no MAC, so with ~0.4%
    # probability random garbage has valid padding -- then the output
    # must still not be the plaintext)
    try:
        decrypt_file(enc, str(tmp_path / "bad.bin"), derive_key("wrong"))
        assert open(tmp_path / "bad.bin", "rb").read() != payload
    except ValueError:
        pass

    # distinct IV per encryption: same plaintext, different ciphertext
    enc2 = str(tmp_path / "enc2.bin")
    encrypt_file(str(src), enc2, key)
    assert open(enc2, "rb").read() != blob
    decrypt_file(enc2, str(tmp_path / "dec2.bin"), key)
    assert open(tmp_path / "dec2.bin", "rb").read() == payload


def test_cipher_streams_compose_with_gzip(tmp_path):
    """The reference's full stream order: text -> gzip -> cipher -> file,
    read back cipher -> gzip -> text, chunked (no whole-payload buffer)."""
    key = derive_key("pw")
    path = tmp_path / "doc.gz.enc"
    text = ("line %d of the export document\n" * 1).join(
        str(i) for i in range(5000)
    )
    raw = open(path, "wb")
    w = io.BufferedWriter(CipherWriter(raw, key))
    gz = gzip.GzipFile(fileobj=w, mode="wb")
    for i in range(0, len(text), 777):  # deliberately unaligned chunks
        gz.write(text[i:i + 777].encode())
    gz.close()
    w.close()

    r = io.BufferedReader(CipherReader(open(path, "rb"), key))
    assert r.peek(2)[:2] == b"\x1f\x8b"  # gzip magic visible AFTER decrypt
    back = gzip.GzipFile(fileobj=r).read().decode()
    assert back == text


@pytest.mark.parametrize("compression", [None, "gzip"])
def test_export_json_encrypted_roundtrip(spark, tmp_path, compression):
    from tests.test_formats import _canon, tricky_df
    from yadamu___yet_another_data_migration_utility_spark.sources.exportfile import (
        export_json,
        import_json,
    )

    df = tricky_df(spark)
    key = derive_key("export passphrase")
    path = str(tmp_path / "export.json.enc")
    export_json({"t": df}, path, compression=compression, encryption_key=key)
    with open(path, "rb") as f:
        head = f.read(64)
    assert b"systemInformation" not in head and head[:1] != b"{"
    back = import_json(spark, path, encryption_key=key)["t"]
    assert _canon(back) == _canon(df)
