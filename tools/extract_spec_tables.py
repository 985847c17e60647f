#!/usr/bin/env python3
"""Extract 3GPP numeric spec constants into srsran_tpu/data/*.npz.

The LDPC base-graph shift tables (TS38.212 Tables 5.3.2-2 / 5.3.2-3) and the
polar reliability sequence (TS38.212 Table 5.3.1.2-1) are standard-mandated
numeric constants.  Rather than hand-typing thousands of integers (error
prone), this tool parses them out of the reference C++ source
(/root/reference/lib/phy/upper/channel_coding/...) and stores them as
compressed numpy arrays.  Only the numeric spec data is taken; no code.

Outputs:
  srsran_tpu/data/ldpc_bg_tables.npz
      bg1: int32 [8, 46, 68]   shift value per (lifting-set index, row, col); -1 = no edge
      bg2: int32 [8, 42, 52]
  srsran_tpu/data/polar_tables.npz
      reliability_1024: int32 [1024]  universal reliability sequence Q (Nmax=1024)
"""

import re
import numpy as np
from pathlib import Path

REF = Path("/root/reference/lib/phy/upper/channel_coding")
OUT = Path(__file__).resolve().parent.parent / "srsran_tpu" / "data"
OUT.mkdir(parents=True, exist_ok=True)


def extract_ldpc():
    text = (REF / "ldpc/ldpc_luts_impl.cpp").read_text()
    # Find the two big matrix blocks.
    out = {}
    for name, nrows, ncols in (("BG1_matrices", 46, 68), ("BG2_matrices", 42, 52)):
        start = text.index(f"std::array<BG_matrix_t, NOF_LIFTING_INDICES> {name}")
        # The next array definition or function marks the end.
        end = text.index(";", text.index("}};", start))
        block = text[start:end]
        block = re.sub(r"//[^\n]*", "", block)  # strip comments
        block = block[block.index("{"):]        # drop the declaration itself
        # Tokenize: numbers and NO_EDGE markers in order.
        toks = re.findall(r"NO_EDGE|\d+", block)
        vals = [-1 if t == "NO_EDGE" else int(t) for t in toks]
        need = 8 * nrows * ncols
        assert len(vals) == need, (name, len(vals), need)
        out[name[:3].lower()] = np.array(vals, dtype=np.int32).reshape(8, nrows, ncols)
    np.savez_compressed(OUT / "ldpc_bg_tables.npz", bg1=out["bg1"], bg2=out["bg2"])
    print("ldpc ok", out["bg1"].shape, out["bg2"].shape)


def extract_polar():
    text = (REF / "polar/polar_code_impl.cpp").read_text()
    start = text.index("mother_code_10 = {")
    end = text.index("};", start)
    toks = re.findall(r"\d+", text[start + len("mother_code_10 = {"):end])
    vals = [int(t) for t in toks]
    assert len(vals) == 1024 and sorted(vals) == list(range(1024)), len(vals)

    # TS38.212 Table 5.3.1.1-1: DL input-bit interleaver pattern (K_IL_max=164).
    itext = (REF / "polar/polar_interleaver_impl.cpp").read_text()
    istart = itext.index("pattern = {")
    iend = itext.index("};", istart)
    ivals = [int(t) for t in re.findall(r"\d+", itext[istart + len("pattern = {"):iend])]
    assert len(ivals) == 164 and sorted(ivals) == list(range(164)), len(ivals)

    np.savez_compressed(OUT / "polar_tables.npz",
                        reliability_1024=np.array(vals, dtype=np.int32),
                        interleaver_pattern=np.array(ivals, dtype=np.int32))
    print("polar ok", len(vals), len(ivals))


def extract_short_block():
    # TS38.212 Table 5.3.3.3-1: Reed-Muller (32, 11) basis sequences.
    text = (REF / "short/short_block_encoder_impl.cpp").read_text()
    start = text.index("BASIS_SEQUENCES = {")
    end = text.index("}};", start)
    vals = [int(t) for t in re.findall(r"\d+", text[start + len("BASIS_SEQUENCES = {"):end])]
    assert len(vals) == 11 * 32, len(vals)
    np.savez_compressed(OUT / "short_block_tables.npz",
                        rm_basis=np.array(vals, dtype=np.int8).reshape(11, 32))
    print("short block ok")


def extract_prach():
    # TS38.211 Table 6.3.3.1-3: logical -> physical root sequence order, L=839.
    text = Path("/root/reference/lib/phy/upper/channel_processors/"
                "prach_generator_impl.cpp").read_text()
    start = text.index("get_sequence_number_long")
    start = text.index("lut = {", start)
    end = text.index("};", start)
    vals = [int(t) for t in re.findall(r"\d+", text[start + len("lut = {"):end])]
    assert len(vals) == 838 and sorted(vals) == list(range(1, 839)), len(vals)
    np.savez_compressed(OUT / "prach_tables.npz",
                        long_root_order=np.array(vals, dtype=np.int32))
    print("prach ok", len(vals))


def extract_low_papr():
    # TS38.211 Tables 5.2.2.2-1..4: phi values for M_sc in {6, 12, 18, 24}.
    text = Path("/root/reference/lib/phy/upper/sequence_generators/"
                "low_papr_sequence_generator_impl.cpp").read_text()
    out = {}
    for m in (6, 12, 18, 24):
        start = text.index(f"phi_M_sc_{m} = {{")
        end = text.index("}};", start)
        vals = [int(t) for t in
                re.findall(r"-?\d+", text[start + len(f"phi_M_sc_{m} = {{"):end])]
        assert len(vals) == 30 * m, (m, len(vals))
        out[f"phi_{m}"] = np.array(vals, dtype=np.int32).reshape(30, m)
    np.savez_compressed(OUT / "low_papr_tables.npz", **out)
    print("low papr ok")


def extract_prach_config():
    # TS38.211 Tables 6.3.3.2-2/-3 (FR1 paired / unpaired): prach config
    # index -> (format, x, y-list, subframe-list, start_sym, nof_slots_sf,
    # nof_occasions, duration).
    import json
    text = Path("/root/reference/lib/ran/prach/prach_configuration.cpp").read_text()
    out = {}
    for name, marker in (("fr1_paired", "prach_configuration_get_fr1_paired"),
                         ("fr1_unpaired", "prach_configuration_get_fr1_unpaired"),
                         ("fr2_unpaired", "prach_configuration_get_fr2_unpaired")):
        start = text.index(marker)
        start = text.index("table =", start)
        start = text.index("{", start)
        end = text.index("}};", start)
        block = text[start + 1:end]
        row_re = re.compile(
            r"\{prach_format_type::(\w+),\s*(\d+),\s*\{([\d,\s]*)\},"
            r"\s*\{([\d,\s]*)\},\s*(\d+),\s*(\d+),\s*(\d+),\s*(\d+)\}"
            r"|\{PRACH_CONFIG_RESERVED\}")
        parsed = []
        fmt_map = {"zero": "0", "one": "1", "two": "2", "three": "3"}
        for m in row_re.finditer(block):
            if m.group(1) is None:
                parsed.append(None)
                continue
            fmt = fmt_map.get(m.group(1), m.group(1))
            parsed.append({
                "format": fmt,
                "x": int(m.group(2)),
                "y": [int(v) for v in m.group(3).split(",") if v.strip()],
                "subframes": [int(v) for v in m.group(4).split(",") if v.strip()],
                "starting_symbol": int(m.group(5)),
                "nof_prach_slots_within_subframe": int(m.group(6)),
                "nof_occasions_within_slot": int(m.group(7)),
                "duration": int(m.group(8)),
            })
        assert len(parsed) == 256, (name, len(parsed))
        out[name] = parsed
    (OUT / "prach_config_tables.json").write_text(json.dumps(out))
    print("prach config ok", {k: len(v) for k, v in out.items()})


if __name__ == "__main__":
    extract_ldpc()
    extract_polar()
    extract_short_block()
    extract_prach()
    extract_low_papr()
    extract_prach_config()
