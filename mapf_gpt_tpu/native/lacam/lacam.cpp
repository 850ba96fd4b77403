#include "lacam.hpp"

#include <algorithm>
#include <cassert>
#include <chrono>
#include <deque>
#include <queue>

namespace lacam {

// ---------------------------------------------------------------------------
// Grid
// ---------------------------------------------------------------------------

Grid::Grid(const std::string& map_text) {
  std::vector<std::vector<uint8_t>> rows;
  std::vector<uint8_t> row;
  for (char c : map_text) {
    if (c == '\n') {
      if (!row.empty()) rows.push_back(row);
      row.clear();
    } else if (c == '.') {
      row.push_back(0);
    } else if (c == '#' || c == '@' || c == 'T') {
      row.push_back(1);
    }  // other chars (spaces) ignored
  }
  if (!row.empty()) rows.push_back(row);
  height = (int)rows.size();
  width = height ? (int)rows[0].size() : 0;
  blocked.resize(height * width);
  for (int i = 0; i < height; i++)
    for (int j = 0; j < width; j++) blocked[i * width + j] = rows[i][j];
  build_adjacency();
}

Grid::Grid(int h, int w, const std::vector<uint8_t>& blocked_cells)
    : height(h), width(w), blocked(blocked_cells) {
  build_adjacency();
}

void Grid::build_adjacency() {
  const int dirs[4][2] = {{-1, 0}, {1, 0}, {0, -1}, {0, 1}};
  for (int d = 0; d < 4; d++) nbr[d].assign(height * width, -1);
  for (int i = 0; i < height; i++)
    for (int j = 0; j < width; j++) {
      int v = i * width + j;
      if (blocked[v]) continue;
      for (int d = 0; d < 4; d++) {
        int ni = i + dirs[d][0], nj = j + dirs[d][1];
        if (ni >= 0 && ni < height && nj >= 0 && nj < width &&
            !blocked[ni * width + nj])
          nbr[d][v] = ni * width + nj;
      }
    }
}

// ---------------------------------------------------------------------------
// Distance tables (BFS from each goal)
// ---------------------------------------------------------------------------

DistTables::DistTables(const Grid& g, const Config& goals) : grid(g) {
  tables.resize(goals.size());
  std::vector<int> queue_buf(grid.size());
  for (size_t a = 0; a < goals.size(); a++) {
    auto& dist = tables[a];
    dist.assign(grid.size(), -1);
    int head = 0, tail = 0;
    dist[goals[a]] = 0;
    queue_buf[tail++] = goals[a];
    while (head < tail) {
      int v = queue_buf[head++];
      for (int d = 0; d < 4; d++) {
        int u = grid.nbr[d][v];
        if (u >= 0 && dist[u] < 0) {
          dist[u] = dist[v] + 1;
          queue_buf[tail++] = u;
        }
      }
    }
  }
}

// ---------------------------------------------------------------------------
// Deadline
// ---------------------------------------------------------------------------

Deadline::Deadline(double s)
    : limit_s(s), start(std::chrono::steady_clock::now()) {}
bool Deadline::over() const { return elapsed_s() >= limit_s; }
double Deadline::elapsed_s() const {
  return std::chrono::duration<double>(std::chrono::steady_clock::now() -
                                       start)
      .count();
}

int Solution::sum_of_loss(const Config& goals) const {
  int loss = 0;
  for (size_t t = 1; t < configs.size(); t++)
    for (size_t a = 0; a < goals.size(); a++)
      if (configs[t][a] != goals[a] || configs[t - 1][a] != goals[a]) loss++;
  return loss;
}

// ---------------------------------------------------------------------------
// Search node structures
// ---------------------------------------------------------------------------

namespace {

struct ConfigHash {
  size_t operator()(const Config& q) const {
    size_t h = 14695981039346656037ULL;
    for (int v : q) {
      h ^= (size_t)(v + 0x9e3779b9);
      h *= 1099511628211ULL;
    }
    return h;
  }
};

// Low-level constraint node: the first `depth` agents of the owner's order
// are pinned to specific vertices.
struct LNode {
  std::vector<int> where;  // where[k] = forced vertex of order[k]
  int depth = 0;
};

struct HNode {
  Config Q;
  HNode* parent = nullptr;
  int g = 0;          // cost-to-come (sum-of-loss edges)
  int h = 0;          // sum of BFS distances to goals
  std::vector<float> priority;   // PIBT dynamic priorities
  std::vector<int> order;        // agents by priority desc
  std::deque<LNode> tree;        // lazy low-level constraint queue
  std::vector<HNode*> edges_out; // discovered transitions, for rewiring
};

struct Searcher {
  const Grid& grid;
  const Config& starts;
  const Config& goals;
  const Options& opt;
  DistTables dist;
  std::mt19937 rng;
  int A;

  std::vector<HNode*> all_nodes;
  std::unordered_map<Config, HNode*, ConfigHash> explored;
  std::vector<HNode*> open;  // DFS stack
  HNode* h_goal = nullptr;

  // PIBT scratch
  Config Qto;
  std::vector<int> occupied_now, occupied_next;

  Searcher(const Grid& grid, const Config& starts, const Config& goals,
           const Options& opt)
      : grid(grid), starts(starts), goals(goals), opt(opt),
        dist(grid, goals), rng(opt.seed), A((int)starts.size()),
        occupied_now(grid.size(), -1), occupied_next(grid.size(), -1) {}

  ~Searcher() {
    for (auto* n : all_nodes) delete n;
  }

  int heuristic(const Config& q) const {
    int h = 0;
    for (int a = 0; a < A; a++) {
      int d = dist.get(a, q[a]);
      if (d < 0) return -1;  // infeasible instance
      h += d;
    }
    return h;
  }

  int edge_cost(const Config& from, const Config& to) const {
    // sum-of-loss contribution of the transition: agents not resting on goal
    int c = 0;
    for (int a = 0; a < A; a++)
      if (from[a] != goals[a] || to[a] != goals[a]) c++;
    return c;
  }

  HNode* make_node(const Config& q, HNode* parent) {
    auto* n = new HNode;
    all_nodes.push_back(n);
    n->Q = q;
    n->parent = parent;
    n->h = heuristic(q);
    n->priority.resize(A);
    if (parent == nullptr) {
      // initial priority: normalized distance-to-goal as tie-break
      int maxd = 1;
      for (int a = 0; a < A; a++) maxd = std::max(maxd, dist.get(a, q[a]));
      for (int a = 0; a < A; a++)
        n->priority[a] = (float)dist.get(a, q[a]) / (maxd + 1);
      n->g = 0;
    } else {
      n->g = parent->g + edge_cost(parent->Q, q);
      // dynamic priorities: grow while off-goal, reset on arrival
      for (int a = 0; a < A; a++)
        n->priority[a] = q[a] == goals[a]
                             ? (float)(parent->priority[a] -
                                       (int)parent->priority[a])
                             : parent->priority[a] + 1.0f;
    }
    n->order.resize(A);
    for (int a = 0; a < A; a++) n->order[a] = a;
    std::sort(n->order.begin(), n->order.end(), [&](int i, int j) {
      return n->priority[i] > n->priority[j];
    });
    n->tree.push_back(LNode{});  // root: no constraints
    return n;
  }

  // ---- PIBT config generation under constraints --------------------------
  bool func_pibt(const Config& Q, int a) {
    // candidate moves sorted by distance-to-goal, random tie-break
    int cands[5];
    int n_c = 0;
    cands[n_c++] = Q[a];
    for (int d = 0; d < 4; d++) {
      int u = grid.nbr[d][Q[a]];
      if (u >= 0) cands[n_c++] = u;
    }
    std::shuffle(cands, cands + n_c, rng);
    std::sort(cands, cands + n_c, [&](int u, int v) {
      return dist.get(a, u) < dist.get(a, v);
    });
    for (int k = 0; k < n_c; k++) {
      int v = cands[k];
      if (occupied_next[v] >= 0) continue;  // vertex conflict
      int b = occupied_now[v];
      if (b >= 0 && Qto[b] == Q[a]) continue;  // swap conflict
      Qto[a] = v;
      occupied_next[v] = a;
      if (b >= 0 && b != a && Qto[b] < 0) {
        if (!func_pibt(Q, b)) {  // priority inheritance + backtracking
          Qto[a] = -1;
          occupied_next[v] = -1;
          continue;
        }
      }
      return true;
    }
    return false;
  }

  bool gen_config(HNode* n, const LNode& l, Config& out) {
    const Config& Q = n->Q;
    Qto.assign(A, -1);
    for (int a = 0; a < A; a++) occupied_now[Q[a]] = a;
    bool ok = true;
    // apply constraints
    for (int k = 0; k < l.depth && ok; k++) {
      int a = n->order[k], v = l.where[k];
      if (occupied_next[v] >= 0) { ok = false; break; }      // vertex clash
      int b = occupied_now[v];
      if (b >= 0 && Qto[b] == Q[a]) { ok = false; break; }   // swap clash
      Qto[a] = v;
      occupied_next[v] = a;
    }
    if (ok) {
      for (int k = 0; k < A && ok; k++) {
        int a = n->order[k];
        if (Qto[a] < 0) ok = func_pibt(Q, a);
      }
    }
    if (ok) out = Qto;
    // clear scratch
    for (int a = 0; a < A; a++) {
      occupied_now[Q[a]] = -1;
      if (Qto[a] >= 0) occupied_next[Qto[a]] = -1;
    }
    return ok;
  }

  void expand_lowlevel(HNode* n, const LNode& l) {
    if (l.depth >= A) return;
    int a = n->order[l.depth];
    int vs[5];
    int n_v = 0;
    vs[n_v++] = n->Q[a];
    for (int d = 0; d < 4; d++) {
      int u = grid.nbr[d][n->Q[a]];
      if (u >= 0) vs[n_v++] = u;
    }
    std::shuffle(vs, vs + n_v, rng);
    for (int k = 0; k < n_v; k++) {
      LNode child = l;
      child.where.push_back(vs[k]);
      child.depth = l.depth + 1;
      n->tree.push_back(std::move(child));
    }
  }

  // Dijkstra relaxation through recorded edges after a cheaper path is found
  void rewire_from(HNode* src) {
    std::deque<HNode*> q{src};
    while (!q.empty()) {
      HNode* n = q.front();
      q.pop_front();
      for (HNode* m : n->edges_out) {
        int ng = n->g + edge_cost(n->Q, m->Q);
        if (ng < m->g) {
          m->g = ng;
          m->parent = n;
          q.push_back(m);
        }
      }
    }
  }

  Solution run() {
    Solution sol;
    Deadline deadline(opt.time_limit_s);
    if (heuristic(starts) < 0) return sol;  // some goal unreachable

    HNode* init = make_node(starts, nullptr);
    explored[starts] = init;
    open.push_back(init);

    int iter = 0;
    // once a goal config is known, cap the anytime search at 60% of the
    // budget so LNS refinement gets the remainder
    const double search_cap = opt.refine_iters > 0 ? 0.6 : 1.0;
    while (!open.empty()) {
      if ((++iter & 0xFF) == 0 &&
          (deadline.over() ||
           (h_goal != nullptr &&
            deadline.elapsed_s() >= search_cap * deadline.limit_s)))
        break;
      HNode* n = open.back();

      if (h_goal != nullptr && n->g >= h_goal->g) {  // pruned branch
        open.pop_back();
        continue;
      }
      if (n->Q == goals) {
        if (h_goal == nullptr || n->g < h_goal->g) h_goal = n;
        if (!opt.anytime) break;
        open.pop_back();
        continue;
      }
      if (n->tree.empty()) {  // exhausted low-level tree
        open.pop_back();
        continue;
      }
      LNode l = std::move(n->tree.front());
      n->tree.pop_front();
      expand_lowlevel(n, l);

      Config q_new;
      if (l.depth == 0 && opt.pibt_ensemble > 1) {
        // Monte-Carlo config generation: several PIBT rollouts, keep the
        // best f = g + edge_cost + h (the reference's PIBT ensemble,
        // ref:lacam3/src/planner.cpp:208-248, sequential here)
        bool found = false;
        long best_f = 0;
        Config cand;
        for (int e = 0; e < opt.pibt_ensemble; e++) {
          if (!gen_config(n, l, cand)) continue;
          int hh = heuristic(cand);
          if (hh < 0) continue;
          long f = (long)n->g + edge_cost(n->Q, cand) + hh;
          if (!found || f < best_f) {
            best_f = f;
            q_new = cand;
            found = true;
          }
        }
        if (!found) continue;
      } else if (!gen_config(n, l, q_new)) {
        continue;
      }

      auto it = explored.find(q_new);
      if (it == explored.end()) {
        HNode* m = make_node(q_new, n);
        explored[q_new] = m;
        n->edges_out.push_back(m);
        open.push_back(m);
      } else {
        HNode* m = it->second;
        n->edges_out.push_back(m);
        int ng = n->g + edge_cost(n->Q, q_new);
        if (ng < m->g) {
          m->g = ng;
          m->parent = n;
          rewire_from(m);
        }
        if (h_goal == nullptr) open.push_back(m);  // revisit (completeness)
      }
    }

    if (h_goal == nullptr) return sol;
    // backtrack configs
    std::vector<Config> rev;
    for (HNode* n = h_goal; n != nullptr; n = n->parent) rev.push_back(n->Q);
    sol.configs.assign(rev.rbegin(), rev.rend());
    sol.solved = true;
    if (opt.refine_iters > 0)
      sol = refine(grid, starts, goals, dist, std::move(sol),
                   opt.refine_iters, opt.seed + 1, deadline);
    return sol;
  }
};

}  // namespace

Solution solve(const Grid& grid, const Config& starts, const Config& goals,
               const Options& opt) {
  Searcher s(grid, starts, goals, opt);
  return s.run();
}

Solution refine(const Grid& grid, const Config& starts, const Config& goals,
                const DistTables& dist, Solution sol, int iters, int seed,
                const Deadline& deadline) {
  // Single-agent large-neighborhood search: re-plan one agent at a time with
  // a 0-1-cost time-expanded Dijkstra against the others' frozen paths
  // (vertex + swap conflicts), accepting strict sum-of-loss improvements.
  // The reference refines random groups of up to 30 agents with SIPP under a
  // collision table (ref:lacam3/src/refiner.cpp, src/sipp.cpp); single-agent
  // moves are that scheme's group-size-1 case and already capture most of
  // the post-hoc slack in PIBT solutions.
  if (!sol.solved || sol.configs.size() < 2) return sol;
  (void)dist;
  const int A = (int)starts.size();
  const int T = (int)sol.configs.size() - 1;
  const int V = grid.size();
  std::vector<int> occ((size_t)(T + 1) * V, -1);
  std::vector<std::vector<int>> paths(A, std::vector<int>(T + 1));
  for (int t = 0; t <= T; t++)
    for (int a = 0; a < A; a++) {
      paths[a][t] = sol.configs[t][a];
      occ[(size_t)t * V + paths[a][t]] = a;
    }
  auto loss_of = [&](const std::vector<int>& p, int goal) {
    int l = 0;
    for (int t = 1; t <= T; t++)
      if (p[t] != goal || p[t - 1] != goal) l++;
    return l;
  };
  std::mt19937 rng(seed);
  const int INF = 1 << 29;
  std::vector<int> cost((size_t)(T + 1) * V);
  std::vector<int> parent((size_t)(T + 1) * V);
  for (int it = 0; it < iters; it++) {
    if ((it & 7) == 0 && deadline.over()) break;
    int a = (int)(rng() % A);
    int goal = goals[a];
    int old_loss = loss_of(paths[a], goal);
    if (old_loss == 0) continue;
    for (int t = 0; t <= T; t++) occ[(size_t)t * V + paths[a][t]] = -1;
    std::fill(cost.begin(), cost.end(), INF);
    std::fill(parent.begin(), parent.end(), -1);
    std::deque<size_t> dq;
    size_t s0 = (size_t)0 * V + starts[a];
    cost[s0] = 0;
    dq.push_back(s0);
    while (!dq.empty()) {
      size_t cur = dq.front();
      dq.pop_front();
      int t = (int)(cur / V), v = (int)(cur % V);
      if (t == T) continue;
      int moves[5];
      int n_m = 0;
      moves[n_m++] = v;
      for (int d = 0; d < 4; d++)
        if (grid.nbr[d][v] >= 0) moves[n_m++] = grid.nbr[d][v];
      for (int m = 0; m < n_m; m++) {
        int u = moves[m];
        size_t nxt = (size_t)(t + 1) * V + u;
        if (occ[nxt] >= 0) continue;                       // vertex conflict
        int b = occ[(size_t)t * V + u];
        if (b >= 0 && occ[(size_t)(t + 1) * V + v] == b) continue;  // swap
        int c = (u == goal && v == goal) ? 0 : 1;
        if (cost[cur] + c < cost[nxt]) {
          cost[nxt] = cost[cur] + c;
          parent[nxt] = (int)cur;
          if (c == 0) dq.push_front(nxt);
          else dq.push_back(nxt);
        }
      }
    }
    size_t goal_state = (size_t)T * V + goal;
    if (cost[goal_state] < old_loss) {
      std::vector<int> np(T + 1);
      size_t cur = goal_state;
      for (int t = T; t >= 0; t--) {
        np[t] = (int)(cur % V);
        if (t > 0) cur = (size_t)parent[cur];
      }
      paths[a] = np;
    }
    for (int t = 0; t <= T; t++) occ[(size_t)t * V + paths[a][t]] = a;
  }
  for (int t = 0; t <= T; t++)
    for (int a = 0; a < A; a++) sol.configs[t][a] = paths[a][t];
  // trim trailing all-on-goal configs (makespan may shrink)
  while (sol.configs.size() > 1 &&
         sol.configs[sol.configs.size() - 2] == goals)
    sol.configs.pop_back();
  return sol;
}

bool is_feasible(const Grid& grid, const Config& starts, const Config& goals,
                 const Solution& sol, std::string* error) {
  auto fail = [&](const std::string& msg) {
    if (error) *error = msg;
    return false;
  };
  if (!sol.solved || sol.configs.empty()) return fail("unsolved");
  int A = (int)starts.size();
  if (sol.configs.front() != starts) return fail("bad start config");
  if (sol.configs.back() != goals) return fail("bad final config");
  for (size_t t = 1; t < sol.configs.size(); t++) {
    const auto& prev = sol.configs[t - 1];
    const auto& cur = sol.configs[t];
    for (int a = 0; a < A; a++) {
      if (!grid.free_cell(cur[a])) return fail("agent on obstacle");
      bool edge = cur[a] == prev[a];
      for (int d = 0; d < 4 && !edge; d++)
        edge = grid.nbr[d][prev[a]] == cur[a];
      if (!edge) return fail("non-adjacent move");
      for (int b = a + 1; b < A; b++) {
        if (cur[a] == cur[b]) return fail("vertex conflict");
        if (cur[a] == prev[b] && cur[b] == prev[a])
          return fail("swap conflict");
      }
    }
  }
  return true;
}

}  // namespace lacam
