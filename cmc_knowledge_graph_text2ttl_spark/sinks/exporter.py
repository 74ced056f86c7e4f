"""Optional exporter: push triples to a remote SPARQL/graph endpoint.

The reference uploads each document's Turtle to Stardog over HTTP with
basic-auth or Azure OAuth retries (runner.py:411-431, processor.py:330-577).
That is out of scope for the engine core (SURVEY.md §2.3) — at 10^12
documents per-graph HTTP PUTs are not a sink — but the seam is kept as an
optional exporter with the same wire shape:

* payload: N-Triples batches (the canonical serialization),
* auth: basic (user/password via ``$ENV`` indirection like the reference,
  processor.py:2142-2151) OR bearer via an injectable ``token_provider``
  with refresh-on-401 and backoff-on-5xx retries (the reference's
  Azure-OAuth/MSAL retry loop, runner.py:434-477 — here the token source
  is injected so MSAL/any IdP plugs in without a dependency),
* transport injectable → unit-testable without a network; the real
  transport uses urllib (no hard dependency on ``requests``).

Batching: ``foreachPartition`` posts one batch per partition — bounded
payload sizes, retries per batch, no driver bottleneck.
"""

from __future__ import annotations

import base64
import os
from typing import Callable, List, Optional

from pyspark.sql import DataFrame

from .ttl import triples_to_nt_lines

Transport = Callable[[str, bytes, dict], int]  # (url, body, headers) -> status


def _env_indirect(value: Optional[str]) -> Optional[str]:
    """``$NAME`` values resolve through the environment (processor.py:2142)."""
    if value and value.startswith("$"):
        resolved = os.environ.get(value[1:])
        if resolved is None:
            raise ValueError(f"credential environment variable {value[1:]} is not set")
        return resolved
    return value


def _default_transport(url: str, body: bytes, headers: dict) -> int:
    import urllib.request

    req = urllib.request.Request(url, data=body, headers=headers, method="POST")
    with urllib.request.urlopen(req, timeout=60) as resp:  # nosec - explicit opt-in sink
        return resp.status


def export_to_endpoint(
    triples: DataFrame,
    endpoint: str,
    username: Optional[str] = None,
    password: Optional[str] = None,
    transport: Optional[Transport] = None,
    max_batch_lines: int = 50_000,
    token_provider: Optional[Callable[[], str]] = None,
    max_retries: int = 3,
    backoff_s: float = 0.5,
) -> int:
    """POST the triples table as N-Triples batches; returns batch count.

    One POST per (partition, chunk). The transport is pickled to the
    executors — inject a fake in tests; leave None for urllib.

    Auth/retry parity with the reference's OAuth loop (runner.py:434-477):
    when ``token_provider`` is given, requests carry ``Bearer <token>``;
    a 401/403 refreshes the token ONCE per failure and retries; 5xx
    retries with exponential backoff up to ``max_retries``. The token is
    fetched lazily per partition (not per batch).
    """
    import time as _time

    username = _env_indirect(username)
    password = _env_indirect(password)
    base_headers = {"Content-Type": "application/n-triples"}
    if username is not None and token_provider is None:
        token = base64.b64encode(f"{username}:{password or ''}".encode()).decode()
        base_headers["Authorization"] = f"Basic {token}"
    send = transport or _default_transport

    def post_partition(rows) -> List[int]:
        # token fetched lazily on the first actual POST — empty partitions
        # must not hit the identity provider
        token_box = {"t": None, "init": False}

        def hdrs() -> dict:
            if token_provider is not None and not token_box["init"]:
                token_box["t"] = token_provider()
                token_box["init"] = True
            h = dict(base_headers)
            if token_box["t"]:
                h["Authorization"] = f"Bearer {token_box['t']}"
            return h

        def send_with_retry(body: bytes) -> None:
            delay = backoff_s
            for attempt in range(max_retries + 1):
                status = send(endpoint, body, hdrs())
                if status < 300:
                    return
                if (
                    status in (401, 403)
                    and token_provider is not None
                    and attempt < max_retries
                ):
                    token_box["t"] = token_provider()  # refresh and retry
                    continue
                if 500 <= status < 600 and attempt < max_retries:
                    _time.sleep(delay)
                    delay *= 2
                    continue
                raise RuntimeError(
                    f"endpoint returned {status} after {attempt + 1} attempts"
                )

        batch: List[tuple] = []
        sent = 0
        for r in rows:
            batch.append(
                (r.subj, r.pred, r.obj_kind, r.obj_lexical, r.obj_lang, r.obj_datatype)
            )
            if len(batch) >= max_batch_lines:
                send_with_retry("\n".join(triples_to_nt_lines(batch)).encode("utf8"))
                sent += 1
                batch = []
        if batch:
            send_with_retry("\n".join(triples_to_nt_lines(batch)).encode("utf8"))
            sent += 1
        return [sent]

    counts = triples.select(
        "subj", "pred", "obj_kind", "obj_lexical", "obj_lang", "obj_datatype"
    ).rdd.mapPartitions(post_partition).collect()
    return sum(counts)
