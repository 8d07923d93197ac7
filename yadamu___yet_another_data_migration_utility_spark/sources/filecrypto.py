"""File encryption chain (C1 -- the reference's ENCRYPT/DECRYPT family).

Wire format and key derivation match the reference exactly so an
encrypted export is interoperable:

- key = scrypt(passphrase, salt, dklen=32) with Node's crypto.scrypt
  default cost (N=16384, r=8, p=1) -- yadamu.js:279-293; default salt
  yadamuConstants.js:26;
- file = [16-byte random IV][AES-256-CBC ciphertext of the (optionally
  gzipped) payload], PKCS7 padding -- the cipher stream + IVWriter
  prefix of fileDBI.js:346-360/:81-88, read back by IVReader + the
  decipher (:90-105, :570-585). CLI family: yadamuCLI.js:86-103.

Everything streams: the writer/reader wrappers below encrypt/decrypt
chunk-by-chunk (O(chunk) memory), and they compose under the gzip layer
exactly like the reference's pipeline (data -> gzip -> cipher -> IV ->
file), so the monolithic export keeps its bounded-memory property with
encryption on. Uses the ``cryptography`` package (the one external dep;
everything else in sources/ is stdlib + Spark).
"""

from __future__ import annotations

import hashlib
import io
import os

try:
    from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes
    from cryptography.hazmat.primitives.padding import PKCS7

    HAVE_CRYPTO = True
except ImportError:  # pragma: no cover - cryptography is installed here
    HAVE_CRYPTO = False

#: the reference's defaults (yadamuConstants.js:24-26)
DEFAULT_SALT = "YABASCYADAMUUMADAYCSABAY"
IV_LENGTH = 16
KEY_SIZE = 32


def _require_crypto() -> None:
    if not HAVE_CRYPTO:
        raise RuntimeError(
            "file encryption needs the 'cryptography' package "
            "(pip install cryptography)"
        )


def derive_key(passphrase: str, salt: str = DEFAULT_SALT) -> bytes:
    """scrypt(passphrase, salt) -> 32-byte AES key, Node-default cost
    parameters (crypto.scrypt: N=16384, r=8, p=1)."""
    return hashlib.scrypt(
        passphrase.encode("utf-8"), salt=salt.encode("utf-8"),
        n=16384, r=8, p=1, maxmem=64 * 1024 * 1024, dklen=KEY_SIZE,
    )


class CipherWriter(io.RawIOBase):
    """File-like sink: plaintext in, [IV][CBC ciphertext] out. Safe to
    stack a gzip/text layer on top (the reference's stream order)."""

    def __init__(self, raw, key: bytes, iv: bytes | None = None):
        _require_crypto()
        self._raw = raw
        iv = os.urandom(IV_LENGTH) if iv is None else iv
        if len(iv) != IV_LENGTH:
            raise ValueError(f"IV must be {IV_LENGTH} bytes")
        self._enc = Cipher(algorithms.AES(key), modes.CBC(iv)).encryptor()
        self._pad = PKCS7(128).padder()
        self._raw.write(iv)  # IVWriter: the prefix IS the header

    def writable(self) -> bool:
        return True

    def write(self, data) -> int:
        ct = self._enc.update(self._pad.update(bytes(data)))
        if ct:
            self._raw.write(ct)
        return len(data)

    def close(self) -> None:
        if not self.closed:
            self._raw.write(self._enc.update(self._pad.finalize()))
            self._raw.write(self._enc.finalize())
            self._raw.close()
        super().close()


class CipherReader(io.RawIOBase):
    """File-like source over [IV][CBC ciphertext]: read() yields
    plaintext. Wrong key/corrupt file surfaces as a padding ValueError
    at EOF (CBC carries no MAC -- same property as the reference)."""

    def __init__(self, raw, key: bytes):
        _require_crypto()
        self._raw = raw
        iv = raw.read(IV_LENGTH)
        if len(iv) != IV_LENGTH:
            raise ValueError("encrypted file too short: missing IV prefix")
        self._dec = Cipher(algorithms.AES(key), modes.CBC(iv)).decryptor()
        self._unpad = PKCS7(128).unpadder()
        self._buf = b""
        self._eof = False

    def readable(self) -> bool:
        return True

    def readinto(self, b) -> int:
        want = len(b)
        while len(self._buf) < want and not self._eof:
            chunk = self._raw.read(1 << 20)
            if chunk:
                self._buf += self._unpad.update(self._dec.update(chunk))
            else:
                self._eof = True
                tail = self._dec.finalize()
                self._buf += self._unpad.update(tail) + self._unpad.finalize()
        out, self._buf = self._buf[:want], self._buf[want:]
        b[: len(out)] = out
        return len(out)

    def close(self) -> None:
        if not self.closed:
            self._raw.close()
        super().close()


def encrypt_file(src: str, dst: str, key: bytes, chunk_size: int = 1 << 20) -> None:
    """The CLI ENCRYPT operation (yadamuCLI.js:86-103): wrap an existing
    file in the [IV][ciphertext] envelope, streaming."""
    with open(src, "rb") as f, open(dst, "wb") as raw:
        w = CipherWriter(raw, key)
        while True:
            data = f.read(chunk_size)
            if not data:
                break
            w.write(data)
        w.close()


def decrypt_file(src: str, dst: str, key: bytes, chunk_size: int = 1 << 20) -> None:
    """The CLI DECRYPT operation: strip the envelope, streaming."""
    with open(src, "rb") as raw, open(dst, "wb") as out:
        r = CipherReader(raw, key)
        while True:
            data = r.read(chunk_size)
            if not data:
                break
            out.write(data)
        r.close()
