// LaCAM* expert solver for MAPF — a fresh implementation of the algorithm
// family used by the reference's dataset pipeline (ref:dataset/lacam/lacam3,
// "LaCAM: Search-Based Algorithm for Quick Multi-Agent Pathfinding",
// Okumura, AAAI 2023 and its anytime LaCAM* variant).
//
// Design notes (capabilities match SURVEY §2.2; the code is not derived from
// the reference):
//   * 4-connected grid graph over a '.'/'#' map.
//   * Per-agent BFS distance tables from goals, computed on demand.
//   * High-level: DFS over joint configurations with an EXPLORED hash map,
//     lazy low-level constraint trees per node, Dijkstra-style rewiring of
//     the search DAG when a known configuration is rediscovered with a
//     cheaper cost (the "*" in LaCAM*), anytime improvement until the
//     deadline once a goal config is found.
//   * Config generator: PIBT (priority inheritance with backtracking) with
//     vertex + swap conflict checks, honoring the low-level constraints.
//   * Edge cost: number of agents not on their goals (sum-of-loss metric).
//
// Exposed both as a C++ API and a C ABI (capi.cpp) for the ctypes bridge in
// mapf_gpt_tpu/dataset/expert.py.
#pragma once

#include <chrono>
#include <cstdint>
#include <random>
#include <string>
#include <unordered_map>
#include <vector>

namespace lacam {

using Config = std::vector<int>;  // joint positions, one vertex id per agent

struct Grid {
  int height = 0, width = 0;
  std::vector<uint8_t> blocked;            // h*w, 1 = obstacle
  std::vector<int> nbr[4];                 // neighbor vertex id or -1, per dir
  explicit Grid(const std::string& map_text);
  Grid(int h, int w, const std::vector<uint8_t>& blocked_cells);
  int size() const { return height * width; }
  bool free_cell(int v) const { return !blocked[v]; }

 private:
  void build_adjacency();
};

// Per-agent BFS distance-from-goal table, built lazily per agent.
struct DistTables {
  const Grid& grid;
  std::vector<std::vector<int32_t>> tables;  // [agents][vertices], -1 unreachable
  DistTables(const Grid& grid, const Config& goals);
  int get(int agent, int v) const { return tables[agent][v]; }
};

struct Deadline {
  double limit_s;
  std::chrono::steady_clock::time_point start;
  explicit Deadline(double limit_s);
  bool over() const;
  double elapsed_s() const;
};

struct Solution {
  bool solved = false;
  std::vector<Config> configs;  // configs[t][agent] = vertex at step t
  int makespan() const { return (int)configs.size() - 1; }
  int sum_of_loss(const Config& goals) const;
};

struct Options {
  double time_limit_s = 1.0;
  int seed = 0;
  bool anytime = true;       // keep improving after first solution (LaCAM*)
  int pibt_ensemble = 4;     // Monte-Carlo configs per unconstrained expansion
                             // (the reference runs a 10-thread PIBT ensemble,
                             // ref:lacam3/src/planner.cpp:208-248; here the
                             // candidates run sequentially)
  int refine_iters = 2000;    // LNS+SIPP refinement attempts after a solution
                             // (0 disables; ref:lacam3/src/refiner.cpp)
  int verbosity = 0;
};

Solution solve(const Grid& grid, const Config& starts, const Config& goals,
               const Options& opt);

// Large-neighborhood-search refinement: repeatedly re-plan single agents with
// SIPP against the others' frozen paths, accepting sum-of-loss improvements
// (the reference's async refiner pool, ref:lacam3/src/refiner.cpp:3-69 +
// src/sipp.cpp). Returns the (possibly improved) solution.
Solution refine(const Grid& grid, const Config& starts, const Config& goals,
                const DistTables& dist, Solution sol, int iters, int seed,
                const Deadline& deadline);

// Feasibility validation: starts/goals match, moves are edges, no vertex or
// swap conflicts (the reference validates every solution,
// ref:dataset/lacam/lacam3/src/post_processing.cpp:6-55).
bool is_feasible(const Grid& grid, const Config& starts, const Config& goals,
                 const Solution& sol, std::string* error = nullptr);

}  // namespace lacam
