"""HTTP load generator for a running HydraVox server.

Benchmarks a deployment's serving modes (window coalescing vs continuous
batching vs per-request) under concurrent load: fires `--concurrency`
parallel /tts requests for `--duration` seconds and reports latency
percentiles, effective RTF, and the server's batching counters.

Usage:
  python -m flowmirror_hydravox_tpu.tools.loadgen \
      --url http://127.0.0.1:8080 --speaker default \
      --concurrency 8 --duration 30 [--head-num 4] [--text "..."]

Output: one JSON line, e.g.
  {"requests": 212, "errors": 0, "rps": 7.0, "audio_s_per_s": 28.1,
   "rtf_effective": 0.0355, "latency_p50_ms": 980, "latency_p95_ms": 1420,
   "batched_requests": 180, "continuous_requests": 0}
"""

from __future__ import annotations

import argparse
import base64
import json
import threading
import time
import urllib.request


def _tts_once(url: str, payload: bytes, timeout: float):
    req = urllib.request.Request(
        f"{url}/api/v1/tts", payload, {"Content-Type": "application/json"}
    )
    t0 = time.time()
    with urllib.request.urlopen(req, timeout=timeout) as r:
        body = json.load(r)
    dt = time.time() - t0
    if not body.get("success"):
        raise RuntimeError(body.get("error") or body.get("message"))
    wav = base64.b64decode(body["data"]["audio_base64"])
    # 44-byte WAV header, s16le mono: duration = (len-44) / 2 / sample_rate
    sr = body["data"].get("sample_rate", 24000)
    return dt, max(len(wav) - 44, 0) / 2 / sr


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--url", default="http://127.0.0.1:8080")
    p.add_argument("--speaker", default="default")
    p.add_argument("--text", default="并发负载测试：新闻播报的语速通常是每分钟两百四十字左右。")
    p.add_argument("--concurrency", type=int, default=8)
    p.add_argument("--duration", type=float, default=30.0)
    p.add_argument("--head-num", type=int, default=None,
                   help="inference_head_num (omit for the server default)")
    p.add_argument("--timeout", type=float, default=120.0)
    p.add_argument("--warmup", type=int, default=1,
                   help="untimed warmup requests per worker")
    args = p.parse_args(argv)

    extra = {}
    if args.head_num is not None:
        extra["inference_head_num"] = args.head_num
    payload = json.dumps(
        {"text": args.text, "speaker_id": args.speaker, "extra_params": extra}
    ).encode()

    lats, audio, errors = [], [], []
    lock = threading.Lock()
    stop_at = [0.0]
    t0_box = [0.0]

    def _open_window():
        # barrier action: runs in exactly ONE thread before any are released,
        # so every worker sees the deadline already set (no 0.0 race)
        t0_box[0] = time.time()
        stop_at[0] = t0_box[0] + args.duration

    # all workers finish their (untimed, compile-absorbing) warmup before the
    # timed window opens
    barrier = threading.Barrier(args.concurrency + 1, action=_open_window)

    def worker():
        for _ in range(args.warmup):
            try:
                _tts_once(args.url, payload, args.timeout)
            except Exception:
                pass
        barrier.wait()
        while time.time() < stop_at[0]:
            try:
                dt, dur = _tts_once(args.url, payload, args.timeout)
                with lock:
                    lats.append(dt)
                    audio.append(dur)
            except Exception as e:
                with lock:
                    errors.append(str(e))

    threads = [threading.Thread(target=worker) for _ in range(args.concurrency)]
    for t in threads:
        t.start()
    barrier.wait()  # all warmed; _open_window set the deadline
    for t in threads:
        t.join()
    wall = time.time() - t0_box[0]

    metrics = {}
    try:
        with urllib.request.urlopen(f"{args.url}/api/v1/metrics", timeout=10) as r:
            metrics = json.load(r).get("data") or {}
    except Exception:
        pass

    lats.sort()

    def pct(q):
        return round(lats[min(int(q * len(lats)), len(lats) - 1)] * 1000, 1) if lats else None

    print(json.dumps({
        "requests": len(lats),
        "errors": len(errors),
        "rps": round(len(lats) / max(wall, 1e-9), 2),
        "audio_s_per_s": round(sum(audio) / max(wall, 1e-9), 2),
        "rtf_effective": round(wall / sum(audio), 5) if audio else None,
        "latency_p50_ms": pct(0.50),
        "latency_p95_ms": pct(0.95),
        "batched_requests": metrics.get("batched_requests"),
        "continuous_requests": metrics.get("continuous_requests"),
    }))
    if errors:
        print(json.dumps({"first_errors": errors[:3]}))


if __name__ == "__main__":
    main()
