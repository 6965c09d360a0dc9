"""Portable Elasticsearch bulk sink: ``foreachPartition`` + HTTP
``_bulk`` over stdlib urllib (no connector jar required).

Faithful re-expression of the reference's write path
(``BulkProcessImpl.java``):

- batched bulk requests capped by action count AND payload bytes
  (reference: 10,000 actions / 300 MB, ``:186-187``),
- idempotent index-op with the document id from a key column —
  repeated ids last-write-wins (``:124, 136``); null id -> ES
  auto-generates (duplicate on reload, same as the reference),
- constant-backoff retry on 429/5xx (reference: 1 s x 3, ``:190``),
- lowercased index name (``:64``), doc type omitted (gone in ES 7+).

Scale shape: the reference funnels one JDBC cursor into 10 concurrent
async bulks from a single JVM (``:188``); here every partition writes
its own batches concurrently, so write parallelism == partition count
— ``df.repartition(n)`` is the knob, and per-partition batching keeps
memory O(batch), not O(partition).
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request
from typing import Iterator

from pyspark.sql import DataFrame, Row


def _post(url: str, payload: bytes, timeout: float) -> dict:
    req = urllib.request.Request(
        url,
        data=payload,
        headers={"Content-Type": "application/x-ndjson"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return json.loads(resp.read() or b"{}")


def _send_with_retry(
    url: str, payload: bytes, *, retries: int, retry_wait: float, timeout: float
) -> dict:
    attempt = 0
    while True:
        try:
            return _post(url, payload, timeout)
        except urllib.error.HTTPError as e:
            # ES overload signals: 429 (rejected) / 503; constant backoff
            if e.code in (429, 503) and attempt < retries:
                attempt += 1
                time.sleep(retry_wait)
                continue
            raise
        except urllib.error.URLError:
            # connection-level blips (refused/reset/DNS/timeout) — the
            # transient class the reference's 1s x 3 retry existed for
            if attempt < retries:
                attempt += 1
                time.sleep(retry_wait)
                continue
            raise


def es_bulk_sink(
    df: DataFrame,
    es_url: str,
    index: str,
    *,
    id_col: str | None = None,
    batch_actions: int = 10_000,
    batch_bytes: int = 300 * 1024 * 1024,
    retries: int = 3,
    retry_wait: float = 1.0,
    timeout: float = 60.0,
) -> None:
    """Bulk-index ``df`` into ``es_url``/``index``. Rows are shipped as
    string documents (the reference's row->HashMap<String,String>
    projection is applied by the caller via ``stringify_all``; this sink
    JSON-serializes whatever it is given)."""
    idx = index.lower()
    bulk_url = es_url.rstrip("/") + "/_bulk"
    cols = df.columns

    def write_partition(rows: Iterator[Row]) -> None:
        buf: list[bytes] = []
        n = 0
        nbytes = 0

        def flush() -> None:
            nonlocal buf, n, nbytes
            if not buf:
                return
            resp = _send_with_retry(
                bulk_url,
                b"".join(buf),
                retries=retries,
                retry_wait=retry_wait,
                timeout=timeout,
            )
            # ES reports per-action failures inside an HTTP-200 _bulk
            # response ("errors": true) — mapping conflicts, rejections.
            # Swallowing them silently loses documents; raising lets the
            # Spark task retry replay the partition (idempotent under
            # LWW ids), mirroring the reference's failure listener
            # (BulkProcessImpl.java:164-180).
            if resp.get("errors"):
                failed = [
                    item["index"]
                    for item in resp.get("items", [])
                    if item.get("index", {}).get("error")
                ]
                raise RuntimeError(
                    f"_bulk reported {len(failed)} failed actions "
                    f"(first: {failed[:3]})"
                )
            buf, n, nbytes = [], 0, 0

        for row in rows:
            doc = {c: row[c] for c in cols}
            action: dict = {"index": {"_index": idx}}
            if id_col is not None and row[id_col] is not None:
                action["index"]["_id"] = str(row[id_col])
            line = (
                json.dumps(action, default=str)
                + "\n"
                + json.dumps(doc, default=str)
                + "\n"
            ).encode()
            buf.append(line)
            n += 1
            nbytes += len(line)
            if n >= batch_actions or nbytes >= batch_bytes:
                flush()
        flush()

    df.foreachPartition(write_partition)


def _request(url: str, method: str, payload: bytes | None = None, timeout: float = 60.0) -> dict:
    req = urllib.request.Request(
        url,
        data=payload,
        headers={"Content-Type": "application/json"} if payload else {},
        method=method,
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        body = resp.read()
        return json.loads(body) if body else {}


def es_create_index(
    es_url: str,
    index: str,
    *,
    shards: int = 5,
    replicas: int = 0,
    refresh_interval: str = "-1",
    timeout: float = 60.0,
) -> str:
    """Create an index with the reference's load-optimized settings
    (5 shards / 0 replicas / refresh disabled during bulk,
    BulkProcessImpl.java:64-68); lowercased name. Returns the name."""
    idx = index.lower()
    settings = {
        "settings": {
            "number_of_shards": shards,
            "number_of_replicas": replicas,
            "refresh_interval": refresh_interval,
        }
    }
    _request(
        es_url.rstrip("/") + "/" + idx,
        "PUT",
        json.dumps(settings).encode(),
        timeout,
    )
    return idx


def es_delete_index(es_url: str, index: str, *, timeout: float = 60.0) -> None:
    """Drop an index (ElasticServiceImpl.java:64-87)."""
    _request(es_url.rstrip("/") + "/" + index.lower(), "DELETE", None, timeout)


def es_list_indices(es_url: str, *, timeout: float = 60.0) -> list[str]:
    """All indices with system (dot-prefixed) ones filtered out
    (ElasticServiceImpl.java:90-114: `_all` + the dot filter)."""
    got = _request(es_url.rstrip("/") + "/_cat/indices?format=json", "GET", None, timeout)
    return sorted(
        row["index"] for row in got if not row["index"].startswith(".")
    )
