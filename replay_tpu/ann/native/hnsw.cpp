// HNSW approximate nearest neighbour index.
//
// Native C++ replacement for the reference's hnswlib/nmslib dependency
// (reference: replay/models/extensions/ann/index_builders/*.py build indexes
// with the pip C++ libraries; this file provides the same capability
// without external deps).  Algorithm: Malkov & Yashunin, arXiv 1603.09320.
//
// Exposed via a C ABI (create/add/search/save/load/free) consumed by the
// ctypes wrapper in replay_tpu/ann/hnsw.py.  Spaces: l2, ip (inner
// product, max), cosine (vectors normalized on add).
//
// Build: g++ -O3 -march=native -fopenmp -shared -fPIC hnsw.cpp -o libreplay_hnsw.so

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <queue>
#include <random>
#include <vector>

namespace {

enum Space { L2 = 0, IP = 1, COSINE = 2 };

struct Index {
    int dim;
    int space;
    int M;               // max links per node (levels > 0)
    int M0;              // max links at level 0 (= 2M)
    int ef_construction;
    int ef_search;
    std::vector<float> data;           // n x dim
    std::vector<int64_t> labels;       // external ids
    std::vector<int> levels;           // level per node
    // Level-0 adjacency is FLAT: per node one contiguous block of
    // (M0 + 1) ints — [count, n0, n1, ...] — because level 0 is where
    // ~100% of search hops happen and the former vector<vector<vector>>
    // cost three dependent cache misses per neighbor-list access.
    std::vector<int> nbr0;
    // upper levels are rare (P(level ≥ 1) ≈ 1/M): nested vectors are fine;
    // upper[node][l-1] = neighbors at level l
    std::vector<std::vector<std::vector<int>>> upper;
    int entry_point = -1;
    int max_level = -1;
    std::mt19937_64 rng{42};
    double level_mult;

    Index(int dim_, int space_, int M_, int efc)
        : dim(dim_), space(space_), M(M_), M0(2 * M_), ef_construction(efc),
          ef_search(efc), level_mult(1.0 / std::log(std::max(2, M_))) {}

    inline int size() const { return (int)labels.size(); }

    inline const float* vec(int i) const { return data.data() + (size_t)i * dim; }

    inline const int* nb(int node, int level, int& cnt) const {
        if (level == 0) {
            const int* p = nbr0.data() + (size_t)node * (M0 + 1);
            cnt = p[0];
            return p + 1;
        }
        const auto& v = upper[node][level - 1];
        cnt = (int)v.size();
        return v.data();
    }

    inline float dist(const float* a, const float* b) const {
        if (space == L2) {
            float s = 0.f;
            for (int i = 0; i < dim; ++i) { float d = a[i] - b[i]; s += d * d; }
            return s;
        }
        // ip / cosine: distance = -dot (cosine vectors pre-normalized)
        float s = 0.f;
        for (int i = 0; i < dim; ++i) s += a[i] * b[i];
        return -s;
    }

    int random_level() {
        std::uniform_real_distribution<double> u(0.0, 1.0);
        double r = u(rng);
        return (int)(-std::log(std::max(r, 1e-12)) * level_mult);
    }

    // Epoch-stamped per-thread visited marks: a fresh 50 KB vector + memset
    // per query dominated small-k searches (~13k qps ceiling); bumping the
    // epoch invalidates all marks in O(1).
    struct VisitScratch {
        std::vector<uint32_t> stamp;
        uint32_t epoch = 0;
    };
    static VisitScratch& visit_scratch() {
        thread_local VisitScratch vs;
        return vs;
    }

    // greedy ef-search at one level; returns max-heap of (dist, node) capped at ef
    void search_layer(const float* q, int entry, int level, int ef,
                      std::priority_queue<std::pair<float, int>>& top) const {
        VisitScratch& vs = visit_scratch();
        if (vs.stamp.size() < (size_t)size()) vs.stamp.resize(size() * 2 + 64, 0);
        if (++vs.epoch == 0) {  // wrapped: clear once every 2^32 queries
            std::fill(vs.stamp.begin(), vs.stamp.end(), 0);
            vs.epoch = 1;
        }
        const uint32_t ep = vs.epoch;
        uint32_t* visited = vs.stamp.data();
        // candidates: min-heap by distance
        std::priority_queue<std::pair<float, int>, std::vector<std::pair<float, int>>,
                            std::greater<>> cand;
        float d0 = dist(q, vec(entry));
        cand.push({d0, entry});
        top.push({d0, entry});
        visited[entry] = ep;
        while (!cand.empty()) {
            auto [dc, c] = cand.top();
            if (dc > top.top().first && (int)top.size() >= ef) break;
            cand.pop();
            int cnt;
            const int* nbrs = nb(c, level, cnt);
            for (int j = 0; j < cnt; ++j) {
                int n_id = nbrs[j];
                if (visited[n_id] == ep) continue;
                visited[n_id] = ep;
                float d = dist(q, vec(n_id));
                if ((int)top.size() < ef || d < top.top().first) {
                    cand.push({d, n_id});
                    top.push({d, n_id});
                    if ((int)top.size() > ef) top.pop();
                }
            }
        }
    }

    // pick up to m closest from a candidate heap (simple selection)
    std::vector<int> select_neighbors(std::priority_queue<std::pair<float, int>>& top, int m) const {
        std::vector<std::pair<float, int>> all;
        while (!top.empty()) { all.push_back(top.top()); top.pop(); }
        std::sort(all.begin(), all.end());
        std::vector<int> out;
        for (auto& [d, n] : all) {
            out.push_back(n);
            if ((int)out.size() >= m) break;
        }
        return out;
    }

    // append nb_id to node's level-0 block; on overflow keep the cap
    // closest (the prune step, done in place on the flat block)
    void add_link0(int node, int nb_id) {
        int* p = nbr0.data() + (size_t)node * (M0 + 1);
        if (p[0] < M0) {
            p[1 + p[0]] = nb_id;
            ++p[0];
            return;
        }
        std::vector<std::pair<float, int>> scored;
        scored.reserve(p[0] + 1);
        for (int j = 0; j < p[0]; ++j)
            scored.push_back({dist(vec(node), vec(p[1 + j])), p[1 + j]});
        scored.push_back({dist(vec(node), vec(nb_id)), nb_id});
        std::sort(scored.begin(), scored.end());
        p[0] = M0;
        for (int j = 0; j < M0; ++j) p[1 + j] = scored[j].second;
    }

    void prune_upper(int node, int level) {
        auto& nbrs = upper[node][level - 1];
        if ((int)nbrs.size() <= M) return;
        std::vector<std::pair<float, int>> scored;
        for (int nb_id : nbrs) scored.push_back({dist(vec(node), vec(nb_id)), nb_id});
        std::sort(scored.begin(), scored.end());
        nbrs.clear();
        for (int i = 0; i < M; ++i) nbrs.push_back(scored[i].second);
    }

    void add(const float* v_in, int64_t label) {
        std::vector<float> norm;
        const float* v = v_in;
        if (space == COSINE) {
            norm.assign(v_in, v_in + dim);
            float s = 0.f;
            for (int i = 0; i < dim; ++i) s += norm[i] * norm[i];
            s = std::sqrt(std::max(s, 1e-12f));
            for (int i = 0; i < dim; ++i) norm[i] /= s;
            v = norm.data();
        }
        int id = size();
        data.insert(data.end(), v, v + dim);
        labels.push_back(label);
        int level = random_level();
        levels.push_back(level);
        nbr0.insert(nbr0.end(), M0 + 1, 0);
        upper.emplace_back(level);  // empty neighbor lists for levels 1..level

        if (entry_point < 0) {
            entry_point = id;
            max_level = level;
            return;
        }
        int ep = entry_point;
        // descend from the top to level+1 greedily
        for (int l = max_level; l > level; --l) {
            bool improved = true;
            float best = dist(v, vec(ep));
            while (improved) {
                improved = false;
                int cnt;
                const int* nbrs = nb(ep, l, cnt);
                for (int j = 0; j < cnt; ++j) {
                    float d = dist(v, vec(nbrs[j]));
                    if (d < best) { best = d; ep = nbrs[j]; improved = true; }
                }
            }
        }
        // connect on levels min(level, max_level)..0
        for (int l = std::min(level, max_level); l >= 0; --l) {
            std::priority_queue<std::pair<float, int>> top;
            search_layer(v, ep, l, ef_construction, top);
            auto sel = select_neighbors(top, l == 0 ? M0 : M);
            if (!sel.empty()) ep = sel[0];
            if (l == 0) {
                int* p = nbr0.data() + (size_t)id * (M0 + 1);
                p[0] = (int)sel.size();
                for (int j = 0; j < p[0]; ++j) p[1 + j] = sel[j];
                for (int nb_id : sel) add_link0(nb_id, id);
            } else {
                upper[id][l - 1] = sel;
                for (int nb_id : sel) {
                    upper[nb_id][l - 1].push_back(id);
                    prune_upper(nb_id, l);
                }
            }
        }
        if (level > max_level) {
            max_level = level;
            entry_point = id;
        }
    }

    // filtered variant: labels in excl (sorted) are skipped inside the
    // result collection; ef is inflated by the exclusion count so the
    // traversal still reaches k admissible results (the reference's
    // filter-seen index inferers, index_inferers/*filter*_inferer.py)
    void search_filtered(const float* q_in, int k, const int64_t* excl, int n_excl,
                         int64_t* out_labels, float* out_dists) const {
        std::vector<float> norm;
        const float* q = q_in;
        if (space == COSINE) {
            norm.assign(q_in, q_in + dim);
            float s = 0.f;
            for (int i = 0; i < dim; ++i) s += norm[i] * norm[i];
            s = std::sqrt(std::max(s, 1e-12f));
            for (int i = 0; i < dim; ++i) norm[i] /= s;
            q = norm.data();
        }
        int ep = entry_point;
        for (int l = max_level; l > 0; --l) {
            bool improved = true;
            float best = dist(q, vec(ep));
            while (improved) {
                improved = false;
                int cnt;
                const int* nbrs = nb(ep, l, cnt);
                for (int j = 0; j < cnt; ++j) {
                    float d = dist(q, vec(nbrs[j]));
                    if (d < best) { best = d; ep = nbrs[j]; improved = true; }
                }
            }
        }
        std::priority_queue<std::pair<float, int>> top;
        search_layer(q, ep, 0, std::max(ef_search, k + n_excl), top);
        std::vector<std::pair<float, int>> all;
        while (!top.empty()) { all.push_back(top.top()); top.pop(); }
        std::sort(all.begin(), all.end());
        int written = 0;
        for (auto& [d, node] : all) {
            if (written >= k) break;
            int64_t lab = labels[node];
            if (n_excl && std::binary_search(excl, excl + n_excl, lab)) continue;
            out_labels[written] = lab;
            out_dists[written] = d;
            ++written;
        }
        for (; written < k; ++written) {
            out_labels[written] = -1;
            out_dists[written] = 3.0e38f;
        }
    }

    void search(const float* q_in, int k, int64_t* out_labels, float* out_dists) const {
        std::vector<float> norm;
        const float* q = q_in;
        if (space == COSINE) {
            norm.assign(q_in, q_in + dim);
            float s = 0.f;
            for (int i = 0; i < dim; ++i) s += norm[i] * norm[i];
            s = std::sqrt(std::max(s, 1e-12f));
            for (int i = 0; i < dim; ++i) norm[i] /= s;
            q = norm.data();
        }
        int ep = entry_point;
        for (int l = max_level; l > 0; --l) {
            bool improved = true;
            float best = dist(q, vec(ep));
            while (improved) {
                improved = false;
                int cnt;
                const int* nbrs = nb(ep, l, cnt);
                for (int j = 0; j < cnt; ++j) {
                    float d = dist(q, vec(nbrs[j]));
                    if (d < best) { best = d; ep = nbrs[j]; improved = true; }
                }
            }
        }
        std::priority_queue<std::pair<float, int>> top;
        search_layer(q, ep, 0, std::max(ef_search, k), top);
        std::vector<std::pair<float, int>> all;
        while (!top.empty()) { all.push_back(top.top()); top.pop(); }
        std::sort(all.begin(), all.end());
        for (int i = 0; i < k; ++i) {
            if (i < (int)all.size()) {
                out_labels[i] = labels[all[i].second];
                out_dists[i] = all[i].first;
            } else {
                out_labels[i] = -1;
                out_dists[i] = 3.0e38f;
            }
        }
    }

    bool save(const char* path) const {
        FILE* f = std::fopen(path, "wb");
        if (!f) return false;
        int n = size();
        std::fwrite(&dim, sizeof(int), 1, f);
        std::fwrite(&space, sizeof(int), 1, f);
        std::fwrite(&M, sizeof(int), 1, f);
        std::fwrite(&ef_construction, sizeof(int), 1, f);
        std::fwrite(&n, sizeof(int), 1, f);
        std::fwrite(&entry_point, sizeof(int), 1, f);
        std::fwrite(&max_level, sizeof(int), 1, f);
        std::fwrite(data.data(), sizeof(float), data.size(), f);
        std::fwrite(labels.data(), sizeof(int64_t), labels.size(), f);
        std::fwrite(levels.data(), sizeof(int), levels.size(), f);
        for (int i = 0; i < n; ++i) {
            int nl = levels[i] + 1;
            std::fwrite(&nl, sizeof(int), 1, f);
            for (int l = 0; l < nl; ++l) {
                int c;
                const int* p = nb(i, l, c);
                std::fwrite(&c, sizeof(int), 1, f);
                std::fwrite(p, sizeof(int), c, f);
            }
        }
        std::fclose(f);
        return true;
    }

    static Index* load(const char* path) {
        FILE* f = std::fopen(path, "rb");
        if (!f) return nullptr;
        int dim, space, M, efc, n, ep, ml;
        if (std::fread(&dim, sizeof(int), 1, f) != 1) { std::fclose(f); return nullptr; }
        std::fread(&space, sizeof(int), 1, f);
        std::fread(&M, sizeof(int), 1, f);
        std::fread(&efc, sizeof(int), 1, f);
        std::fread(&n, sizeof(int), 1, f);
        std::fread(&ep, sizeof(int), 1, f);
        std::fread(&ml, sizeof(int), 1, f);
        auto* idx = new Index(dim, space, M, efc);
        idx->entry_point = ep;
        idx->max_level = ml;
        idx->data.resize((size_t)n * dim);
        idx->labels.resize(n);
        idx->levels.resize(n);
        std::fread(idx->data.data(), sizeof(float), idx->data.size(), f);
        std::fread(idx->labels.data(), sizeof(int64_t), n, f);
        std::fread(idx->levels.data(), sizeof(int), n, f);
        idx->nbr0.assign((size_t)n * (idx->M0 + 1), 0);
        idx->upper.resize(n);
        for (int i = 0; i < n; ++i) {
            int nl;
            std::fread(&nl, sizeof(int), 1, f);
            idx->upper[i].resize(nl > 0 ? nl - 1 : 0);
            for (int l = 0; l < nl; ++l) {
                int c;
                std::fread(&c, sizeof(int), 1, f);
                if (l == 0) {
                    int* p = idx->nbr0.data() + (size_t)i * (idx->M0 + 1);
                    p[0] = c;
                    std::fread(p + 1, sizeof(int), c, f);
                } else {
                    auto& lv = idx->upper[i][l - 1];
                    lv.resize(c);
                    std::fread(lv.data(), sizeof(int), c, f);
                }
            }
        }
        std::fclose(f);
        return idx;
    }
};

// Sparse item-item scorer: serves NeighbourRec models (ItemKNN/SLIM/
// AssociationRules) from the sparse similarity matrix — the analog of the
// reference's nmslib sparse index (index_inferers/nmslib_filter_index_inferer.py),
// but EXACT: score(u, j) = Σ_{i ∈ profile(u)} w_i · sim[i, j] accumulated
// over the CSR rows of sim, with seen-item exclusion applied inside the
// kernel before top-k selection.
struct SparseSim {
    int n_items = 0;
    std::vector<int64_t> indptr;  // n_items + 1
    std::vector<int> indices;
    std::vector<float> values;

    bool save(const char* path) const {
        FILE* f = std::fopen(path, "wb");
        if (!f) return false;
        int64_t nnz = (int64_t)indices.size();
        std::fwrite(&n_items, sizeof(int), 1, f);
        std::fwrite(&nnz, sizeof(int64_t), 1, f);
        std::fwrite(indptr.data(), sizeof(int64_t), indptr.size(), f);
        std::fwrite(indices.data(), sizeof(int), indices.size(), f);
        std::fwrite(values.data(), sizeof(float), values.size(), f);
        std::fclose(f);
        return true;
    }

    static SparseSim* load(const char* path) {
        FILE* f = std::fopen(path, "rb");
        if (!f) return nullptr;
        auto* s = new SparseSim();
        int64_t nnz;
        if (std::fread(&s->n_items, sizeof(int), 1, f) != 1) { std::fclose(f); delete s; return nullptr; }
        std::fread(&nnz, sizeof(int64_t), 1, f);
        s->indptr.resize(s->n_items + 1);
        s->indices.resize(nnz);
        s->values.resize(nnz);
        std::fread(s->indptr.data(), sizeof(int64_t), s->indptr.size(), f);
        std::fread(s->indices.data(), sizeof(int), nnz, f);
        std::fread(s->values.data(), sizeof(float), nnz, f);
        std::fclose(f);
        return s;
    }
};

}  // namespace

extern "C" {

void* ssim_create(int n_items, const int64_t* indptr, const int* indices,
                  const float* values, int64_t nnz) {
    auto* s = new SparseSim();
    s->n_items = n_items;
    s->indptr.assign(indptr, indptr + n_items + 1);
    s->indices.assign(indices, indices + nnz);
    s->values.assign(values, values + nnz);
    return s;
}

void ssim_free(void* h) { delete (SparseSim*)h; }

int ssim_size(void* h) { return ((SparseSim*)h)->n_items; }

// queries: CSR user profiles over item positions; excl: CSR per-query seen
// item positions (may be null). Writes [nq, k] labels (-1 padded) + scores.
void ssim_search(void* h, const int64_t* q_indptr, const int* q_indices,
                 const float* q_values, int nq, int k,
                 const int64_t* excl_indptr, const int* excl_indices,
                 int64_t* out_labels, float* out_scores) {
    auto* s = (SparseSim*)h;
    int n = s->n_items;
#pragma omp parallel
    {
        std::vector<float> acc(n, 0.f);
        std::vector<uint8_t> mask(n, 0);
        std::vector<int> touched;
#pragma omp for schedule(dynamic, 16)
        for (int qi = 0; qi < nq; ++qi) {
            touched.clear();
            for (int64_t p = q_indptr[qi]; p < q_indptr[qi + 1]; ++p) {
                int row = q_indices[p];
                float w = q_values[p];
                if (row < 0 || row >= n) continue;
                for (int64_t rp = s->indptr[row]; rp < s->indptr[row + 1]; ++rp) {
                    int j = s->indices[rp];
                    if (!mask[j]) { touched.push_back(j); mask[j] = 1; }
                    acc[j] += w * s->values[rp];
                }
            }
            // drop excluded (seen) items inside the kernel
            if (excl_indptr) {
                for (int64_t p = excl_indptr[qi]; p < excl_indptr[qi + 1]; ++p) {
                    int j = excl_indices[p];
                    if (j >= 0 && j < n) { acc[j] = 0.f; mask[j] = 2; }
                }
            }
            // top-k over touched, skipping masked-out entries
            std::priority_queue<std::pair<float, int>, std::vector<std::pair<float, int>>,
                                std::greater<>> heap;  // min-heap of (score, -item)
            for (int j : touched) {
                if (mask[j] == 2 || acc[j] == 0.f) continue;
                // tie-break: higher item index wins (reference orderBy desc)
                std::pair<float, int> cand{acc[j], j};
                if ((int)heap.size() < k) heap.push(cand);
                else if (cand > heap.top()) { heap.pop(); heap.push(cand); }
            }
            std::vector<std::pair<float, int>> res;
            while (!heap.empty()) { res.push_back(heap.top()); heap.pop(); }
            std::sort(res.rbegin(), res.rend());
            int64_t* ol = out_labels + (size_t)qi * k;
            float* os = out_scores + (size_t)qi * k;
            int w = 0;
            for (auto& [score, j] : res) { ol[w] = j; os[w] = score; ++w; }
            for (; w < k; ++w) { ol[w] = -1; os[w] = -3.0e38f; }
            // reset accumulators
            for (int j : touched) { acc[j] = 0.f; mask[j] = 0; }
            if (excl_indptr) {
                for (int64_t p = excl_indptr[qi]; p < excl_indptr[qi + 1]; ++p) {
                    int j = excl_indices[p];
                    if (j >= 0 && j < n) { acc[j] = 0.f; mask[j] = 0; }
                }
            }
        }
    }
}

int ssim_save(void* h, const char* path) { return ((SparseSim*)h)->save(path) ? 0 : 1; }

void* ssim_load(const char* path) { return SparseSim::load(path); }

void hnsw_search_filtered(void* h, const float* queries, int nq, int k,
                          const int64_t* excl_indptr, const int64_t* excl_labels,
                          int64_t* out_labels, float* out_dists) {
    auto* idx = (Index*)h;
#pragma omp parallel for schedule(dynamic, 8)
    for (int i = 0; i < nq; ++i) {
        const int64_t* excl = excl_labels + excl_indptr[i];
        int n_excl = (int)(excl_indptr[i + 1] - excl_indptr[i]);
        idx->search_filtered(queries + (size_t)i * idx->dim, k, excl, n_excl,
                             out_labels + (size_t)i * k, out_dists + (size_t)i * k);
    }
}

void* hnsw_create(int dim, int space, int M, int ef_construction) {
    return new Index(dim, space, M, ef_construction);
}

void hnsw_free(void* h) { delete (Index*)h; }

void hnsw_set_ef(void* h, int ef) { ((Index*)h)->ef_search = ef; }

int hnsw_size(void* h) { return ((Index*)h)->size(); }

void hnsw_add_items(void* h, const float* vecs, const int64_t* ids, int n) {
    auto* idx = (Index*)h;
    for (int i = 0; i < n; ++i) idx->add(vecs + (size_t)i * idx->dim, ids[i]);
}

void hnsw_search(void* h, const float* queries, int nq, int k,
                 int64_t* out_labels, float* out_dists) {
    auto* idx = (Index*)h;
#pragma omp parallel for schedule(dynamic, 8)
    for (int i = 0; i < nq; ++i) {
        idx->search(queries + (size_t)i * idx->dim, k,
                    out_labels + (size_t)i * k, out_dists + (size_t)i * k);
    }
}

int hnsw_save(void* h, const char* path) { return ((Index*)h)->save(path) ? 0 : 1; }

void* hnsw_load(const char* path) { return Index::load(path); }

}  // extern "C"
