#!/usr/bin/env python
"""Profile one decode loop on real TPU and print per-kernel time totals.

Captures a jax.profiler trace of the headline bench decode loop, then parses
the trace protobuf (xplane.pb) and aggregates TPU op durations by name — the
step-budget ground truth that whole-loop A/B can't give. Relay caveats apply
to absolute numbers; use the *shares* to pick targets.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_decode.py
Env: PD_BATCH (32), PD_STEPS (32), PD_MODE (w4a8_2l), PD_TOP (25)
"""

import glob
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fastforward_tpu.models.llama import LlamaConfig
from fastforward_tpu.serving.stacked import (
    StackedKVCache,
    fuse_stacked_layers,
    make_stacked_decode_loop,
    random_stacked_params,
    serving_forward_stacked,
)

BATCH = int(os.environ.get("PD_BATCH", "32"))
STEPS = int(os.environ.get("PD_STEPS", "32"))
MODE = os.environ.get("PD_MODE", "w4a8_2l")
GROUP = int(os.environ.get("PD_GROUP", "128"))
TOP = int(os.environ.get("PD_TOP", "25"))


def main():
    config = LlamaConfig.llama3_8b()
    params, stacked = random_stacked_params(
        config, mode=MODE, seed=0, group_size=GROUP
    )
    stacked = fuse_stacked_layers(stacked)
    max_len = 512
    cache = StackedKVCache.create(
        num_layers=config.num_layers, batch_size=BATCH, max_len=max_len,
        num_kv_heads=config.num_kv_heads, head_dim=config.head_dim,
        quantized=True,
    )
    ids = jnp.asarray(
        np.random.RandomState(0).randint(0, config.vocab_size, (BATCH, 128))
    )
    prefill = jax.jit(
        lambda p, s, c, i: serving_forward_stacked(
            p, s, config, i, cache=c, logits_positions="last"
        ),
        donate_argnums=(2,),
    )
    # The loop donates its cache (required to fit batch 192: two live
    # slabs + weights exceed HBM) — run warmup and the traced call on
    # cache generations chained through the donation.
    logits, cache = prefill(params, stacked, cache, ids)
    token = jnp.argmax(logits[:, -1], axis=-1).astype(ids.dtype)[:, None]
    loop = make_stacked_decode_loop(config, num_steps=STEPS)
    tokens, cache = loop(params, stacked, cache, token)
    tokens.block_until_ready()

    logdir = "/tmp/ff_profile"
    os.system(f"rm -rf {logdir}")
    jax.profiler.start_trace(logdir)
    tokens, cache = loop(params, stacked, cache, token)
    tokens.block_until_ready()
    np.asarray(tokens[0, -1])
    jax.profiler.stop_trace()

    # Parse xplane protobuf: aggregate XEvent durations per event name on TPU
    # device lines. The tensorflow proto isn't importable here, so decode the
    # wire format minimally: XPlane(name, lines[XLine(events[XEvent(metadata_id,
    # duration_ps)])], event_metadata{id,name}).
    paths = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    if not paths:
        print("no xplane.pb produced", file=sys.stderr)
        return
    data = open(paths[0], "rb").read()

    def read_varint(buf, i):
        shift = 0
        val = 0
        while True:
            b = buf[i]
            val |= (b & 0x7F) << shift
            i += 1
            if not b & 0x80:
                return val, i
            shift += 7

    def fields(buf):
        i = 0
        while i < len(buf):
            tag, i = read_varint(buf, i)
            fnum, wtype = tag >> 3, tag & 7
            if wtype == 0:
                val, i = read_varint(buf, i)
            elif wtype == 2:
                ln, i = read_varint(buf, i)
                val = buf[i : i + ln]
                i += ln
            elif wtype == 5:
                val = buf[i : i + 4]
                i += 4
            elif wtype == 1:
                val = buf[i : i + 8]
                i += 8
            else:
                raise ValueError(f"wire type {wtype}")
            yield fnum, wtype, val

    totals: dict[str, float] = {}
    # XSpace.planes = field 1
    for fnum, _, plane in fields(data):
        if fnum != 1:
            continue
        name = b""
        metadata: dict[int, str] = {}
        lines = []
        for pf, _, pv in fields(plane):
            if pf == 2:
                name = pv
            elif pf == 3:
                lines.append(pv)
            elif pf == 4:  # event_metadata map entry
                for mf, _, mv in fields(pv):
                    if mf == 2:  # value = XEventMetadata
                        mid, mname = None, b""
                        for ef, _, ev in fields(mv):
                            if ef == 1:
                                mid = ev
                            elif ef == 2:
                                mname = ev
                        if mid is not None:
                            metadata[mid] = mname.decode(errors="replace")
        if b"TPU" not in name and b"tpu" not in name:
            continue
        for line in lines:
            for lf, _, lv in fields(line):
                if lf != 4:  # XLine.events
                    continue
                mid, dur = None, 0
                for ef, wt, ev in fields(lv):
                    if ef == 1 and wt == 0:
                        mid = ev
                    elif ef == 4 and wt == 0:  # duration_ps
                        dur = ev
                if mid is not None:
                    key = metadata.get(mid, f"id{mid}")
                    totals[key] = totals.get(key, 0.0) + dur / 1e12
    if not totals:
        print("no TPU events found; planes were:", file=sys.stderr)
        return
    total = sum(totals.values())
    print(f"TPU kernel time total: {total*1e3:.2f} ms over {STEPS} steps "
          f"({total*1e3/STEPS:.3f} ms/step)")
    for k, v in sorted(totals.items(), key=lambda kv: -kv[1])[:TOP]:
        print(f"  {v*1e3:8.2f} ms  {v/total*100:5.1f}%  {k[:110]}")


if __name__ == "__main__":
    main()
