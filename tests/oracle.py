"""Build & drive the reference C++ observation generator as a parity oracle.

The reference repo (read-only at /root/reference) is compiled in a temp dir —
never vendored — and fed scenarios over stdin; it prints the 256-token context
per agent per step.  Used by test_obs_parity.py to pin our on-device tokenizer
to the reference bit-for-bit.  Skipped when the reference or g++ is absent
(a committed .npz golden fixture covers that case).
"""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile

import numpy as np

REF = "/root/reference"

_DRIVER = r"""
#include "observation_generator.h"
#include <cstdio>
int main() {
    int H, W;
    std::cin >> H >> W;
    std::vector<std::vector<int>> grid(H, std::vector<int>(W, 0));
    for (int i = 0; i < H; i++) {
        std::string row; std::cin >> row;
        for (int j = 0; j < W; j++) grid[i][j] = row[j] == '1';
    }
    int A; std::cin >> A;
    std::vector<std::pair<int,int>> goals(A);
    for (auto &g : goals) std::cin >> g.first >> g.second;
    int S; std::cin >> S;
    ObservationGenerator gen(grid, InputParameters());
    for (int s = 0; s < S; s++) {
        std::vector<std::pair<int,int>> pos(A);
        for (auto &p : pos) std::cin >> p.first >> p.second;
        std::vector<int> actions(A);
        for (auto &a : actions) std::cin >> a;
        if (s == 0) gen.create_agents(pos, goals);
        gen.update_agents(pos, goals, actions);
        auto obs = gen.generate_observations();
        for (const auto &row : obs)
            for (size_t k = 0; k < row.size(); k++)
                printf("%d%c", row[k], k + 1 == row.size() ? '\n' : ' ');
    }
    return 0;
}
"""


def build_oracle(build_dir: str) -> str | None:
    """Compile the reference observation generator + driver. Returns binary path."""
    if not os.path.isdir(os.path.join(REF, "mapf_gpt")) or shutil.which("g++") is None:
        return None
    for name in ("observation_generator.cpp", "observation_generator.h"):
        shutil.copy(os.path.join(REF, "mapf_gpt", name), build_dir)
    hdr = os.path.join(build_dir, "observation_generator.h")
    with open(hdr) as f:
        text = f.read()
    # strip the pybind11 dependency and add missing std includes
    text = text.replace("#define PYBIND11_MODULE\n", "")
    text = text.replace("#include <fstream>",
                        "#include <fstream>\n#include <limits>\n#include <deque>")
    with open(hdr, "w") as f:
        f.write(text)
    with open(os.path.join(build_dir, "driver.cpp"), "w") as f:
        f.write(_DRIVER)
    binary = os.path.join(build_dir, "driver")
    try:
        subprocess.run(
            ["g++", "-std=c++17", "-O2", "-fopenmp", "-Dmain=disabled_ref_main",
             "-c", "observation_generator.cpp", "-o", "obsgen.o"],
            cwd=build_dir, check=True, capture_output=True)
        subprocess.run(
            ["g++", "-std=c++17", "-O2", "-fopenmp", "driver.cpp", "obsgen.o",
             "-o", binary], cwd=build_dir, check=True, capture_output=True)
    except subprocess.CalledProcessError:
        return None
    return binary


def run_oracle(binary: str, grid: np.ndarray, goals: np.ndarray,
               positions: np.ndarray, actions: np.ndarray) -> np.ndarray:
    """grid: bool [H,W]; goals: [A,2]; positions: [S,A,2] (post-step, step 0 =
    initial); actions: [S,A] commanded actions fed at each update (-1 at step
    0).  Returns int tokens [S, A, 256]."""
    s, a = actions.shape
    h, w = grid.shape
    lines = [f"{h} {w}"]
    lines += ["".join("1" if c else "0" for c in row) for row in grid]
    lines.append(str(a))
    lines += [f"{g[0]} {g[1]}" for g in goals]
    lines.append(str(s))
    for t in range(s):
        lines.append(" ".join(f"{p[0]} {p[1]}" for p in positions[t]))
        lines.append(" ".join(str(int(x)) for x in actions[t]))
    out = subprocess.run([binary], input="\n".join(lines) + "\n",
                         capture_output=True, text=True, check=True)
    rows = [list(map(int, ln.split())) for ln in out.stdout.splitlines() if ln]
    return np.asarray(rows, dtype=np.int32).reshape(s, a, -1)
