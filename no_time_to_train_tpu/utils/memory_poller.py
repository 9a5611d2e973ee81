"""Accelerator memory poller (replacement for the reference's nvidia-smi
sampler, scripts/run_nttt_eval.sh:26-60): samples jax device allocator stats
to CSV until killed."""
import argparse
import csv
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--interval", type=float, default=2.0)
    a = p.parse_args()
    import jax
    dev = jax.devices()[0]
    with open(a.out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["t", "bytes_in_use",
                                          "peak_bytes_in_use"])
        w.writeheader()
        while True:
            try:
                s = dev.memory_stats() or {}
            except Exception:
                s = {}
            w.writerow({"t": round(time.time(), 1),
                        "bytes_in_use": s.get("bytes_in_use", ""),
                        "peak_bytes_in_use": s.get("peak_bytes_in_use", "")})
            f.flush()
            time.sleep(a.interval)


if __name__ == "__main__":
    main()
