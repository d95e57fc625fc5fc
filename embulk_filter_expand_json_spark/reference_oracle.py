"""Pure-Python reference interpreter — the parity oracle for CDC replay.

A direct, row-at-a-time transcription of the *semantics* the engine must
reproduce (the reference's expansion rules, FilteredPageOutput.java:311-398,
composed with last-writer-wins apply): replay every change event in
log_offset order against an in-memory dict and return the final table
state. The engine's distributed replay must match this state under the
per-row token-array-equality invariant (BASELINE.json input_hint).

Deliberately naive (no vectorization, no Spark) so it cannot share bugs
with the engine implementation.
"""

from __future__ import annotations

import json
from typing import Dict, Iterable, Optional, Tuple


def _valid_upsert(payload: dict) -> bool:
    """Mirror the engine's invalid-record channel for the sequences schema:
    tokens expanded as embulk-type ``json`` must be valid JSON after
    stringification (a bare string like 'oops' is not — test :700-704);
    n_tok expanded as ``long`` must parse (int or numeric fallback)."""
    if "tokens" in payload and payload["tokens"] is not None:
        v = payload["tokens"]
        if isinstance(v, str):
            try:
                json.loads(v)
            except ValueError:
                return False
    if "n_tok" in payload and payload["n_tok"] is not None:
        v = payload["n_tok"]
        if isinstance(v, str):
            try:
                int(v)
            except ValueError:
                try:
                    float(v)
                except ValueError:
                    return False
    return True


def replay(
    events: Iterable[Tuple[int, str, Optional[str]]],
    extra_keys: Iterable[str] = (),
) -> Dict[str, dict]:
    """events: (log_offset, op, payload_json) in ANY order.

    Returns {doc_id: {tokens: [int...], n_tok: int, source: str, <extras>}}.
    """
    extras = list(extra_keys)
    state: Dict[str, dict] = {}
    for log_offset, op, payload in sorted(events, key=lambda e: e[0]):
        if payload is None or payload == "":
            continue  # null doc -> doc_id null -> unroutable, dropped
        try:
            doc = json.loads(payload)
        except ValueError:
            continue  # malformed -> invalid-record channel (skip policy)
        if not isinstance(doc, dict):
            continue
        doc_id = doc.get("doc_id")
        if doc_id is None:
            continue
        if op == "D":
            state.pop(doc_id, None)
            continue
        if not _valid_upsert(doc):
            continue  # invalid record dropped BEFORE dedup
        row = {
            "tokens": doc.get("tokens"),
            "n_tok": int(doc["n_tok"]) if doc.get("n_tok") is not None else None,
            "source": doc.get("source"),
        }
        for k in extras:
            v = doc.get(k)
            row[k] = str(v) if v is not None and not isinstance(v, str) else v
        state[doc_id] = row
    return state
