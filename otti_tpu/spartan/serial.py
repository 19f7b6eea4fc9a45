"""Durable proof serialization (canonical JSON envelope).

The reference keeps proofs in-memory inside spzk and only prints the
verdict (SURVEY.md §3.1 step 3); here every proof can be persisted and
reloaded — scalars as hex strings, points as hex ristretto encodings —
so suites are resumable and proofs are exchangeable artifacts.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any

from . import bullet, nizk, sigma, snark, spark, zknizk, zksumcheck

_CLASSES = {
    cls.__name__: cls
    for cls in (
        bullet.BulletOpeningProof,
        nizk.NIZKProof,
        zknizk.ZKNIZKProof,
        zksumcheck.ZKSumcheckProof,
        sigma.KnowledgeProof,
        sigma.EqualityProof,
        sigma.DualBaseEqualityProof,
        sigma.ProductProof,
        sigma.DotProductProof,
        snark.SNARKProof,
        spark.SparkEvalProof,
        spark.SparkSideProof,
    )
}


def _enc(obj: Any) -> Any:
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return {
            "__type__": type(obj).__name__,
            **{
                f.name: _enc(getattr(obj, f.name))
                for f in dataclasses.fields(obj)
            },
        }
    if isinstance(obj, bytes):
        return {"__bytes__": obj.hex()}
    if isinstance(obj, int) and abs(obj) >= 1 << 53:
        return {"__int__": hex(obj)}
    if isinstance(obj, (list, tuple)):
        return [_enc(v) for v in obj]
    if isinstance(obj, dict):
        return {k: _enc(v) for k, v in obj.items()}
    return obj


def _dec(obj: Any) -> Any:
    if isinstance(obj, dict):
        if "__bytes__" in obj:
            return bytes.fromhex(obj["__bytes__"])
        if "__int__" in obj:
            return int(obj["__int__"], 16)
        if "__type__" in obj:
            cls = _CLASSES[obj["__type__"]]
            kwargs = {
                k: _dec(v) for k, v in obj.items() if k != "__type__"
            }
            fields = {f.name: f for f in dataclasses.fields(cls)}
            for k, f in fields.items():
                if k in kwargs and f.type == "tuple" and isinstance(kwargs[k], list):
                    kwargs[k] = tuple(kwargs[k])
            return cls(**kwargs)
        return {k: _dec(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_dec(v) for v in obj]
    return obj


def dumps(proof) -> str:
    return json.dumps(_enc(proof))


def loads(data: str):
    return _dec(json.loads(data))


def save(proof, path: str):
    with open(path, "w") as f:
        f.write(dumps(proof))


def load(path: str):
    with open(path) as f:
        return loads(f.read())
