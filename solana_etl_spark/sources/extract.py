"""Driver-side RPC block extraction: slot-range generation, retry with
exponential backoff, and gzip-JSON layout — the S1–S5 surface.

RPC fetching is inherently sequential per slot and network-bound, so this
stays driver-side (as in the reference); Spark enters the picture when the
fetched documents are transformed/loaded. The fetcher is injectable so tests
(and air-gapped environments) can run without the network.

Parity (reference file:line):
* retry/backoff: 5 s initial wait, doubled per retry, stop past 60 s;
  RPC error ``-32004`` (block not yet available) always retryable, other
  BlockExceptions are terminal — src/extract/Extract.py:49-78,17-22
* slot ranges: ``end=None`` → infinite count-up (tail forever);
  ``end < start`` → count DOWN inclusive; else count up inclusive —
  src/extract/Extract.py:87-94
* file layout: ``{slot // N * N}/{slot}.json.gz`` — src/extract/ExtractBatch.py:16-23
* every-60-blocks avg call / call+wait / process timing log —
  src/extract/Extract.py:96-124
"""

from __future__ import annotations

import gzip
import itertools
import json
import time
from collections.abc import Callable, Iterable, Iterator
from dataclasses import dataclass
from pathlib import Path

RETRYABLE_BLOCK_NOT_AVAILABLE = -32004
DEFAULT_ENDPOINT = "https://api.mainnet-beta.solana.com"


class BlockException(Exception):
    """RPC-level error envelope (reference src/extract/Extract.py:11-22)."""

    def __init__(self, error_json: dict):
        self.error_json = error_json
        super().__init__(
            f'Error code {error_json["code"]}: {error_json["message"]}'
        )

    def should_retry(self) -> bool:
        return self.error_json["code"] == RETRYABLE_BLOCK_NOT_AVAILABLE


@dataclass
class TimedResponse:
    response: dict | None
    call_time: float
    total_time: float = -1.0


def slot_range(start: int, end: int | None) -> Iterator[int]:
    """end=None → infinite; end<start → descending inclusive; else ascending
    inclusive (reference src/extract/Extract.py:87-94)."""
    if end is None:
        return itertools.count(start)
    if end < start:
        return iter(range(start, end - 1, -1))
    return iter(range(start, end + 1))


def execute_with_backoff(
    call: Callable[[], dict],
    wait_duration: float = 5,
    max_duration: float = 60,
    sleep: Callable[[float], None] = time.sleep,
) -> TimedResponse:
    """Retry any exception (BlockException only if retryable), doubling the
    wait until it exceeds max. Returns response=None on giving up."""
    start = time.perf_counter()
    response = TimedResponse(None, -1.0)
    try:
        call_start = time.perf_counter()
        result = call()
        response = TimedResponse(result, time.perf_counter() - call_start)
    except Exception as e:  # noqa: BLE001 — parity: reference retries any exception
        retryable = e.should_retry() if isinstance(e, BlockException) else True
        if retryable and wait_duration <= max_duration:
            sleep(wait_duration)
            response = execute_with_backoff(
                call, wait_duration * 2, max_duration, sleep
            )
    return TimedResponse(
        response.response, response.call_time, time.perf_counter() - start
    )


def rpc_fetcher(endpoint: str = DEFAULT_ENDPOINT) -> Callable[[int], dict]:
    """Real RPC fetcher via JSON-RPC ``getBlock`` with jsonParsed encoding.
    Import-guarded: no HTTP client is required until actually used."""
    import urllib.request

    def fetch(slot: int) -> dict:
        payload = json.dumps(
            {
                "jsonrpc": "2.0",
                "id": 1,
                "method": "getBlock",
                "params": [slot, {"encoding": "jsonParsed"}],
            }
        ).encode()
        req = urllib.request.Request(
            endpoint, data=payload, headers={"Content-Type": "application/json"}
        )
        with urllib.request.urlopen(req) as resp:
            block = json.loads(resp.read())
        if "error" in block:
            raise BlockException(block["error"])
        return block

    return fetch


def write_block_file(
    output_dir: str | Path, slot: int, block_json: dict, slots_per_dir: int = 10_000
) -> Path:
    """``{bucket}/{slot}.json.gz`` layout (reference ExtractBatch.py:16-23)."""
    bucket_dir = Path(output_dir) / str(slot // slots_per_dir * slots_per_dir)
    bucket_dir.mkdir(parents=True, exist_ok=True)
    path = bucket_dir / f"{slot}.json.gz"
    with gzip.open(path, "w") as f:
        f.write(json.dumps(block_json).encode("utf-8"))
    return path


def extract_batch(
    fetch: Callable[[int], dict],
    output_dir: str | Path,
    start: int,
    end: int | None,
    slots_per_dir: int = 10_000,
    sleep: Callable[[float], None] = time.sleep,
    log: Callable[[str], None] = print,
    slots: Iterable[int] | None = None,
) -> int:
    """The extract loop (reference Extract.start): fetch with backoff, write
    gzip JSON, log rolling averages every 60 blocks. Returns blocks written."""
    total_written = 0
    num_blocks = 0
    call_time = 0.0
    call_time_with_wait = 0.0
    process_time = 0.0

    for slot in slots if slots is not None else slot_range(start, end):
        timed = execute_with_backoff(lambda: fetch(slot), sleep=sleep)
        if timed.response is None:
            log(f"Error fetching info for slot {slot}.")
            continue
        call_time += timed.call_time
        call_time_with_wait += timed.total_time

        t0 = time.perf_counter()
        write_block_file(output_dir, slot, timed.response, slots_per_dir)
        process_time += time.perf_counter() - t0
        num_blocks += 1
        total_written += 1

        if num_blocks % 60 == 0:
            log(
                f"Extracted {num_blocks} blocks ending on {slot} with average times: "
                f"call: {call_time / num_blocks:.2f}s, "
                f"call with wait: {call_time_with_wait / num_blocks:.2f}s, "
                f"process: {process_time / num_blocks:.2f}s."
            )
            num_blocks = 0
            call_time = call_time_with_wait = process_time = 0.0

    return total_written
