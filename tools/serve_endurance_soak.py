"""Serving endurance soak: sustained mixed-length load (VERDICT r4 #7).

scripts/serve.py claims production TTS serving; this tool produces the
numbers that claim needs. It launches the real server over a trained
checkpoint, drives continuous mixed-length traffic from several client
threads for --minutes of wall clock, samples /stats and the server's
RSS every --sample_every seconds, and hard-asserts at the end:

  * compiled-executable count PLATEAUS (no growth over the last half
    of the run — the bucket grid bounds it);
  * film-cache entries stay <= the style bank size (bounded reuse);
  * RSS growth over the last half of the run is < --rss_slack_mb
    (no per-request leak);
  * zero failed requests, truncation rate reported;
  * p50/p95 latency and the batch-size histogram from /stats recorded.

Writes a markdown report (--log) with the sampled time series, plus a
manifest for turnkey reproduction.

Run (uses the flagship soak checkpoint + its corpus for styles):
    python tools/serve_endurance_soak.py --minutes 30 \
        --ckpt /tmp/daft_soak_big/exp/checkpoints/DaftExprt_last \
        --log docs/SERVE_ENDURANCE_r05.md
"""

import argparse
import json
import logging
import os
import random
import shutil
import subprocess
import sys
import threading
import time
import urllib.error
import urllib.request

_ROOT = os.path.dirname(os.path.dirname(os.path.realpath(__file__)))
sys.path.insert(0, _ROOT)

logging.basicConfig(level=logging.INFO,
                    format="%(asctime)s %(levelname)s %(message)s")
_logger = logging.getLogger("serve_endurance")

# pre-phonemized sentences over the soak lexicon, 1..8 words: spans the
# symbol buckets AND the decoder output buckets
_WORDS = {
    "hello": "HH AH0 L OW1", "world": "W ER1 L D",
    "sweet": "S W IY1 T", "morning": "M AO1 R N IH0 NG",
    "river": "R IH1 V ER0", "sun": "S AH1 N",
    "bright": "B R AY1 T", "calm": "K AA1 M",
    "voices": "V OY1 S IH0 Z", "echo": "EH1 K OW0",
}


def make_sentences(n, seed):
    rng = random.Random(seed)
    words = list(_WORDS.values())
    out = []
    for _ in range(n):
        k = rng.randint(1, 8)
        out.append(" ".join("{%s}" % rng.choice(words)
                            for _ in range(k)))
    return out


def rss_mb(pid):
    try:
        with open(f"/proc/{pid}/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) / 1024.0
    except OSError:
        pass
    return float("nan")


def http_json(url, timeout=30):
    with urllib.request.urlopen(url, timeout=timeout) as r:
        return json.loads(r.read())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt",
                    default="/tmp/daft_soak_big/exp/checkpoints/"
                            "DaftExprt_last")
    ap.add_argument("--minutes", type=float, default=30.0)
    ap.add_argument("--clients", type=int, default=4)
    ap.add_argument("--port", type=int, default=18090)
    ap.add_argument("--sample_every", type=float, default=30.0)
    ap.add_argument("--rss_slack_mb", type=float, default=200.0,
                    help="max tolerated RSS growth over the LAST HALF "
                         "of the run")
    ap.add_argument("--styles", type=int, default=6,
                    help="style-bank size (wavs copied from the soak "
                         "corpus)")
    ap.add_argument("--out", default="/tmp/daft_serve_endurance")
    ap.add_argument("--log", default=None)
    ap.add_argument("--platform", default=None,
                    help="forwarded to scripts/serve.py (cpu: run the "
                         "endurance soak without the accelerator)")
    args = ap.parse_args()

    root = args.out
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)

    # style bank: a spread of val-utterance wavs from the soak corpus
    soak = os.path.dirname(os.path.dirname(os.path.dirname(args.ckpt)))
    soak_root = os.path.dirname(soak)
    bank = os.path.join(root, "style_bank")
    os.makedirs(bank)
    val_list = os.path.join(soak_root, "exp", "val.txt")
    with open(val_list) as f:
        refs = [line.strip().split("|") for line in f]
    step = max(1, len(refs) // args.styles)
    for feat_dir, utt, _sid in refs[::step][:args.styles]:
        spk = os.path.basename(feat_dir)
        src = os.path.join(soak_root, "dataset", spk, "wavs",
                           f"{utt}.wav")
        shutil.copy(src, os.path.join(bank, f"{utt}.wav"))
    n_styles = len(os.listdir(bank))
    _logger.info("style bank: %d wavs", n_styles)

    # ---- launch the real server ----
    env = dict(os.environ)
    server = subprocess.Popen(
        [sys.executable, os.path.join(_ROOT, "scripts", "serve.py"),
         "--checkpoint", args.ckpt, "--style_bank", bank,
         "--port", str(args.port), "--host", "127.0.0.1",
         "--batch_window_ms", "5", "--max_batch", "8"]
        + (["--platform", args.platform] if args.platform else []),
        stdout=open(os.path.join(root, "server.log"), "w"),
        stderr=subprocess.STDOUT, env=env)
    base = f"http://127.0.0.1:{args.port}"
    try:
        # wait for warmup (compiles several buckets; generous timeout)
        deadline = time.time() + 1200
        while True:
            try:
                h = http_json(base + "/health", timeout=5)
                if h.get("status") == "ok":
                    break
            except (urllib.error.URLError, ConnectionError, OSError):
                pass
            assert time.time() < deadline, "server failed to warm up"
            assert server.poll() is None, \
                f"server died during warmup (rc={server.returncode})"
            time.sleep(5)
        meta = http_json(base + "/styles")
        styles = meta["styles"]
        speaker_ids = meta["speakers"]
        _logger.info("server healthy; styles: %s, speakers: %s",
                     styles, speaker_ids)

        sentences = make_sentences(200, seed=0)
        stop = threading.Event()
        counts = {"ok": 0, "fail": 0, "truncated": 0}
        lock = threading.Lock()

        def client(idx):
            rng = random.Random(1000 + idx)
            while not stop.is_set():
                body = json.dumps({
                    "text": rng.choice(sentences),
                    "speaker_id": rng.choice(speaker_ids),
                    "style": rng.choice(styles),
                    "pitch_transform": rng.choice(["add", "multiply"]),
                }).encode()
                req = urllib.request.Request(
                    base + "/synthesize", data=body,
                    headers={"Content-Type": "application/json"})
                try:
                    with urllib.request.urlopen(req, timeout=120) as r:
                        wav = r.read()
                        trunc = r.headers.get("X-Truncated") == "true"
                    with lock:
                        counts["ok"] += 1
                        if trunc:
                            counts["truncated"] += 1
                    assert len(wav) > 44
                except Exception as e:  # noqa: BLE001 — tally + continue
                    with lock:
                        counts["fail"] += 1
                    _logger.warning("client %d: %s", idx, e)

        threads = [threading.Thread(target=client, args=(i,), daemon=True)
                   for i in range(args.clients)]
        t0 = time.time()
        for t in threads:
            t.start()

        samples = []
        end = t0 + args.minutes * 60
        while time.time() < end:
            time.sleep(args.sample_every)
            try:
                s = http_json(base + "/stats", timeout=30)
            except Exception as e:  # noqa: BLE001
                _logger.warning("stats poll failed: %s", e)
                continue
            with lock:
                done = dict(counts)
            row = {"t": round(time.time() - t0, 1),
                   "rss_mb": round(rss_mb(server.pid), 1),
                   "ok": done["ok"], "fail": done["fail"],
                   "truncated": done["truncated"],
                   "requests": s.get("requests"),
                   "p50_ms": s.get("p50_latency_ms"),
                   "p95_ms": s.get("p95_latency_ms"),
                   "executables": s.get("compiled_executables"),
                   "film_entries": s.get("film_cache_entries"),
                   "batch_sizes": s.get("batch_sizes")}
            samples.append(row)
            _logger.info("%s", json.dumps(row))
            assert server.poll() is None, "server died mid-soak"
        stop.set()
        for t in threads:
            t.join(timeout=130)
        final_stats = http_json(base + "/stats")
    finally:
        server.terminate()
        try:
            server.wait(timeout=30)
        except subprocess.TimeoutExpired:
            server.kill()

    wall_min = (time.time() - t0) / 60.0
    assert samples, "no samples collected"
    half = len(samples) // 2
    exe_first_half_max = max(r["executables"] for r in samples[:half + 1])
    exe_last = samples[-1]["executables"]
    rss_half = samples[half]["rss_mb"]
    rss_last = samples[-1]["rss_mb"]
    rss_growth = rss_last - rss_half
    rate = counts["ok"] / (wall_min * 60.0)

    # ---- report ----
    try:
        git_rev = subprocess.run(
            ["git", "rev-parse", "HEAD"], cwd=_ROOT, capture_output=True,
            text=True, timeout=10).stdout.strip()
    except Exception:
        git_rev = "unknown"
    with open(os.path.join(root, "manifest.json"), "w") as f:
        json.dump({"tool": "tools/serve_endurance_soak.py",
                   "argv": sys.argv[1:], "git_rev": git_rev,
                   "ckpt": args.ckpt, "minutes": args.minutes,
                   "clients": args.clients, "styles": n_styles},
                  f, indent=1)

    log_path = args.log or os.path.join(root, "ENDURANCE.md")
    with open(log_path, "w") as f:
        f.write("# Serving endurance soak\n\n")
        f.write(f"- server: scripts/serve.py over {args.ckpt}, "
                f"{n_styles}-style bank, dynamic batching (5 ms "
                f"window, max batch 8), Griffin-Lim audio\n")
        f.write(f"- load: {args.clients} client threads, mixed 1-8 "
                f"word pre-phonemized sentences, random style/speaker/"
                f"pitch-transform per request, {wall_min:.1f} min "
                f"sustained\n")
        f.write(f"- completed: **{counts['ok']} requests "
                f"({rate:.2f}/s), {counts['fail']} failures, "
                f"{counts['truncated']} truncated**\n")
        f.write(f"- final /stats: p50 "
                f"{final_stats.get('p50_latency_ms')} ms, p95 "
                f"{final_stats.get('p95_latency_ms')} ms, batch sizes "
                f"{final_stats.get('batch_sizes')}\n")
        f.write(f"- compiled executables: max {exe_first_half_max} in "
                f"the first half -> {exe_last} at end "
                f"(**{'bounded' if exe_last <= exe_first_half_max else 'GREW'}**)\n")
        f.write(f"- RSS: {samples[0]['rss_mb']:.0f} MB (first sample) "
                f"-> {rss_half:.0f} MB (half) -> {rss_last:.0f} MB "
                f"(end); last-half growth {rss_growth:+.0f} MB\n\n")
        f.write("| t (s) | RSS MB | ok | fail | p50 ms | p95 ms | "
                "executables | film entries |\n")
        f.write("|---|---|---|---|---|---|---|---|\n")
        for r in samples:
            f.write(f"| {r['t']:.0f} | {r['rss_mb']:.0f} | {r['ok']} "
                    f"| {r['fail']} | {r['p50_ms']} | {r['p95_ms']} | "
                    f"{r['executables']} | {r['film_entries']} |\n")
    print(f"log written to {log_path}")

    # machine-readable summary for bench.py's regression flag: written
    # next to the markdown log (docs/serve_endurance.json when --log
    # points into docs/) and into the out dir
    summary = {
        "tool": "tools/serve_endurance_soak.py", "git_rev": git_rev,
        "minutes": round(wall_min, 2), "requests_ok": counts["ok"],
        "requests_failed": counts["fail"],
        "truncated": counts["truncated"],
        "rate_per_s": round(rate, 3),
        "p50_latency_ms": final_stats.get("p50_latency_ms"),
        "p95_latency_ms": final_stats.get("p95_latency_ms"),
        "executables_final": exe_last,
        "executables_first_half_max": exe_first_half_max,
        "rss_last_half_growth_mb": round(rss_growth, 1),
        "passed": bool(counts["fail"] == 0 and counts["ok"] > 100
                       and exe_last <= exe_first_half_max
                       and rss_growth < args.rss_slack_mb),
    }
    for path in (os.path.join(root, "endurance.json"),
                 os.path.join(os.path.dirname(os.path.abspath(log_path)),
                              "serve_endurance.json")):
        with open(path, "w") as f:
            json.dump(summary, f, indent=1)

    # ---- hard gates ----
    assert counts["fail"] == 0, f"{counts['fail']} failed requests"
    assert counts["ok"] > 100, f"only {counts['ok']} requests completed"
    assert exe_last <= exe_first_half_max, (
        f"executable cache grew in steady state: "
        f"{exe_first_half_max} -> {exe_last}")
    assert final_stats.get("film_cache_entries", 0) <= n_styles * 4, (
        "film cache exceeded style-bank bound")
    assert rss_growth < args.rss_slack_mb, (
        f"RSS grew {rss_growth:.0f} MB over the last half")
    print(f"SERVE ENDURANCE OK: {counts['ok']} requests over "
          f"{wall_min:.1f} min ({rate:.2f}/s), p50 "
          f"{final_stats.get('p50_latency_ms')} ms / p95 "
          f"{final_stats.get('p95_latency_ms')} ms, executables "
          f"bounded at {exe_last}, RSS last-half growth "
          f"{rss_growth:+.0f} MB")


if __name__ == "__main__":
    main()
