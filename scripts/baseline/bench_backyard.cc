// Measured CPU baseline for the reference's build-graph hot loop.
//
// Compiles the REFERENCE's BackyardHash + BlendedSort (from
// /root/reference/src, unmodified, via -I) against the minimal Boost
// shims in boost_shim/, and times the exact inner pipeline of
// `goss build-graph` (GossCmdBuildGraph.cc:300-420): kmerize fwd+rc
// windows -> concurrent BackyardHash::insert -> BackyardHash::sort.
//
// Workload mirrors bench.py: 4.6 Mbp random genome, 30x coverage of
// 100 bp reads, rho = 26 (k = 25).  Reported metric: rho-mer insertions
// per second, end to end over insert + sort (reading/parsing excluded,
// exactly as bench.py excludes it).
//
// Usage: bench_backyard [n_threads] [genome_mb] [coverage]

#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <random>
#include <thread>
#include <vector>

#include "BackyardHash.hh"

using Gossamer::position_type;

int main(int argc, char** argv) {
    const uint64_t threads = argc > 1 ? std::atoi(argv[1]) : 2;
    const double genome_mb = argc > 2 ? std::atof(argv[2]) : 4.6;
    const int coverage = argc > 3 ? std::atoi(argv[3]) : 30;
    const uint64_t rho = 26;
    const int read_len = 100;

    // synthetic genome + tiled reads (same generator shape as bench.py)
    std::mt19937_64 rng(42);
    const uint64_t glen = (uint64_t)(genome_mb * 1e6);
    std::vector<uint8_t> genome(glen);
    for (auto& b : genome) b = rng() & 3;

    // pre-kmerize into the flat edge stream (fwd + rc), untimed: the
    // reference overlaps parsing with insertion via reader threads, and
    // bench.py also excludes synthesis/parse from the timed region.
    std::vector<uint64_t> edges;
    edges.reserve(2 * coverage * (glen / read_len) * (read_len - rho + 1));
    const uint64_t mask = (rho * 2 == 64) ? ~0ULL : ((1ULL << (2 * rho)) - 1);
    for (int c = 0; c < coverage; ++c) {
        uint64_t off = rng() % read_len;
        for (uint64_t s = off; s + read_len <= glen; s += read_len) {
            uint64_t fwd = 0, rc = 0;
            for (int i = 0; i < read_len; ++i) {
                uint64_t b = genome[s + i];
                fwd = ((fwd << 2) | b) & mask;
                rc = (rc >> 2) | ((3 - b) << (2 * (rho - 1)));
                if (i >= (int)rho - 1) {
                    edges.push_back(fwd);
                    edges.push_back(rc);
                }
            }
        }
    }
    const uint64_t n_edges = edges.size();
    std::fprintf(stderr, "# %llu rho-mer insertions (fwd+rc)\n",
                 (unsigned long long)n_edges);

    // table sized exactly as goss build-graph -B 2 does
    // (GossCmdBuildGraph.cc:445-447)
    const uint64_t bufBytes = 2ULL << 30;
    const uint64_t slotBits = BackyardHash::maxSlotBits(bufBytes);
    const uint64_t numSlots =
        bufBytes / (uint64_t)(1.5 * sizeof(uint32_t) +
                              sizeof(BackyardHash::value_type));
    BackyardHash h(slotBits, 2 * rho, numSlots);

    auto t0 = std::chrono::steady_clock::now();
    std::vector<std::thread> pool;
    for (uint64_t t = 0; t < threads; ++t) {
        pool.emplace_back([&, t]() {
            uint64_t lo = n_edges * t / threads;
            uint64_t hi = n_edges * (t + 1) / threads;
            for (uint64_t i = lo; i < hi; ++i) {
                h.insert(position_type(edges[i]));
            }
        });
    }
    for (auto& th : pool) th.join();
    auto t1 = std::chrono::steady_clock::now();

    std::vector<uint32_t> perm;
    h.sort(perm, threads);
    auto t2 = std::chrono::steady_clock::now();

    double d_ins = std::chrono::duration<double>(t1 - t0).count();
    double d_sort = std::chrono::duration<double>(t2 - t1).count();
    double total = d_ins + d_sort;
    std::fprintf(stderr,
                 "# insert %.2fs  sort %.2fs  distinct %llu  spills %llu\n",
                 d_ins, d_sort, (unsigned long long)h.size(),
                 (unsigned long long)h.spills());
    std::printf(
        "{\"metric\": \"cpu_backyard_kmers_per_sec\", \"value\": %.1f, "
        "\"unit\": \"rho-mers/s\", \"threads\": %llu}\n",
        n_edges / total, (unsigned long long)threads);
    return 0;
}
