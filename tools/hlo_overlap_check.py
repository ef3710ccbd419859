#!/usr/bin/env python
"""Scheduled-HLO evidence that the pipelined channelizer overlaps its
all_to_all with the next block's analyzer compute (SCALING.md §4).

AOT-compiles `sharded_channelize_stream_to_channels` for a real v5e:2x2 TPU
topology (no attached multi-chip hardware needed — the topology client is
compile-only) with `xla_tpu_enable_async_all_to_all=true`, dumps the
scheduled HLO, and reports what sits inside each all-to-all start→done
window. Run in a THROWAWAY process: creating a topology client poisons the
process's default backend for real-device work.

Round-4 result (OVERLAP_HLO.md): the while-body all-to-all becomes an
async start/done pair with the analyzer's banded-FIR convolutions and
fusions scheduled inside the window.
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from yagi_tpu.multichannel import Firpfbch
from yagi_tpu.parallel import sharded_channelize_stream_to_channels

M, B = 64, 3
chz = Firpfbch.create_kaiser(M, 4, 60.0)  # created on the live backend
import jax as _jax
chz_host = _jax.tree_util.tree_map(
    lambda l: np.asarray(l) if hasattr(l, "dtype") else l, chz)

from jax.experimental import topologies
topo = topologies.get_topology_desc(platform="tpu", topology_name="v5e:2x2")
n_dev = len(topo.devices)
print(f"topology v5e:2x2: {n_dev} devices")

from jax.sharding import Mesh
mesh = Mesh(np.asarray(topo.devices).reshape(-1), ("time",))
T = n_dev * 512
x = jax.ShapeDtypeStruct((B, T * M), jnp.complex64)

low = jax.jit(
    lambda v: sharded_channelize_stream_to_channels(chz_host, v, mesh)
).lower(x)
print("lowered OK")
try:
    comp = low.compile({"xla_tpu_enable_async_all_to_all": "true"})
    print("compiled WITH async all-to-all flag")
except Exception as e:
    print("flagged compile failed:", str(e)[:200])
    comp = low.compile()
txt = comp.as_text()
open("OVERLAP_HLO_scheduled.txt", "w").write(txt)
import re
starts = len(re.findall(r"all-to-all-start", txt))
dones = len(re.findall(r"all-to-all-done", txt))
print(f"scheduled HLO: {len(txt)} chars, all-to-all-start x{starts}, done x{dones}")
lines = txt.splitlines()
in_body = False
for i, l in enumerate(lines):
    if "all-to-all-start" in l:
        for j in range(i + 1, min(i + 4000, len(lines))):
            if "all-to-all-done" in lines[j]:
                seg = lines[i + 1:j]
                fus = sum(1 for s in seg if ("fusion" in s or "convolution" in s or " dot(" in s or " dot." in s))
                print(f"start@line{i}: done {j-i} lines later, {fus} fusions/convs/dots scheduled in between")
                break
        else:
            print(f"start@line{i}: no done within 4000 lines")
