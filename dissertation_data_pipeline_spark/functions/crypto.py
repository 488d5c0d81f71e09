"""Column-level encryption helpers (privacy release prep, tier 3).

The privacy ladder in this engine: (1) redaction — destroys the value
(`operators/training.py` PII scrub); (2) pseudonymization — one-way but
join-stable (`ext_k_anonymity`'s md5 tokens); (3) encryption — this
module: reversible for key-holders, opaque to everyone else, the shape
regulated pipelines need for "processable now, erasable later" columns
(drop the key == crypto-erase the column).

Built on Spark's native ``aes_encrypt``/``aes_decrypt`` (JVM-side,
codegen — never a Python UDF):

- **GCM** (default): authenticated, random IV per value — the storage
  mode. NOT deterministic: the same plaintext encrypts differently
  every time, so GCM columns cannot be join/group keys.
- **ECB**: deterministic — same plaintext, same ciphertext — usable as
  a join/group key, at the classic cost: equal plaintexts are visible
  as equal ciphertexts (frequency analysis). For analysis-side
  pseudonyms prefer the md5 token (not reversible at all); reach for
  ECB only when the pseudonym must be reversible by key-holders.

No query registers these (DuckDB has no AES parity to oracle against);
the roundtrip contract is pinned by tests instead.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def encrypt_col(col: Column | str, key: str, *, mode: str = "GCM") -> Column:
    """AES-encrypt a string column; returns binary ciphertext."""
    c = F.col(col) if isinstance(col, str) else col
    return F.aes_encrypt(c.cast("binary"), F.lit(key), F.lit(mode))


def decrypt_col(col: Column | str, key: str, *, mode: str = "GCM") -> Column:
    """Decrypt ``encrypt_col`` output back to the string value."""
    c = F.col(col) if isinstance(col, str) else col
    return F.aes_decrypt(c, F.lit(key), F.lit(mode)).cast("string")
