// Measured CPU baseline for the reference's xenome-classify hot loop.
//
// Compiles the REFERENCE's KmerSet (SparseArray Elias-Fano) and
// WordyBitVector unmodified from /root/reference/src against the
// boost_shim/ headers, and times the exact per-k-mer classification
// loop of `xenome classify` (GossCmdGroupReads.cc:381-468):
//
//     kmer.normalize(K)                 (RankSelect.hh:126-140, FNV)
//     kmers.accessAndRank(kmer, rank)   (SparseArray.hh:278-334)
//     c = lhs.get(rank) << 1 | rhs.get(rank)
//     blrg |= 1 << c
//
// Workload mirrors bench.py's bench_xenome: two 1 Mbp synthetic
// genomes, k = 25, the annotated union k-mer set of both, 200K 100 bp
// reads drawn half from each.  Reads are pre-encoded as 2-bit codes
// (parsing is excluded on both sides; the rolling k-mer extraction is
// inside the timed loop on both sides).  Reported metric: reads/s.
//
// Usage: bench_classify [n_threads] [genome_mb] [n_reads]

#include <algorithm>
#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <random>
#include <thread>
#include <vector>

#include "KmerSet.hh"
#include "StringFileFactory.hh"
#include "WordyBitVector.hh"

using Gossamer::position_type;

int main(int argc, char** argv) {
    const uint64_t threads = argc > 1 ? std::atoi(argv[1]) : 1;
    const double genome_mb = argc > 2 ? std::atof(argv[2]) : 1.0;
    const uint64_t n_reads = argc > 3 ? std::atoll(argv[3]) : 200000;
    const uint64_t k = 25;
    const int read_len = 100;

    std::mt19937_64 rng(7);
    const uint64_t glen = (uint64_t)(genome_mb * 1e6);
    std::vector<std::vector<uint8_t>> genomes(2);
    for (auto& g : genomes) {
        g.resize(glen);
        for (auto& b : g) b = rng() & 3;
    }

    // canonical (normalized) k-mer sets of each genome — the xenome
    // index contents (GossCmdBuildKmerSet + merge-and-annotate)
    const uint64_t mask = (1ULL << (2 * k)) - 1;
    std::vector<std::vector<uint64_t>> sets(2);
    for (int gi = 0; gi < 2; ++gi) {
        auto& g = genomes[gi];
        auto& s = sets[gi];
        s.reserve(glen);
        uint64_t fwd = 0;
        for (uint64_t i = 0; i < glen; ++i) {
            fwd = ((fwd << 2) | g[i]) & mask;
            if (i + 1 >= k) {
                position_type p(fwd);
                p.normalize(k);
                s.push_back(p.asUInt64());
            }
        }
        std::sort(s.begin(), s.end());
        s.erase(std::unique(s.begin(), s.end()), s.end());
    }

    // union + lhs/rhs membership, built with the reference's own
    // Builders through an in-memory factory (as the unit tests do)
    StringFileFactory fac;
    {
        std::vector<uint64_t> uni;
        uni.reserve(sets[0].size() + sets[1].size());
        std::merge(sets[0].begin(), sets[0].end(), sets[1].begin(),
                   sets[1].end(), std::back_inserter(uni));
        uni.erase(std::unique(uni.begin(), uni.end()), uni.end());
        KmerSet::Builder kb(k, "idx", fac, uni.size());
        WordyBitVector::Builder lb("idx.lhs-bits", fac);
        WordyBitVector::Builder rb("idx.rhs-bits", fac);
        for (uint64_t v : uni) {
            kb.push_back(position_type(v));
            lb.push_backX(std::binary_search(sets[0].begin(), sets[0].end(), v));
            rb.push_backX(std::binary_search(sets[1].begin(), sets[1].end(), v));
        }
        kb.end();
        lb.end();
        rb.end();
        std::fprintf(stderr, "# union set: %zu k-mers\n", uni.size());
    }

    KmerSet kmers("idx", fac);
    WordyBitVector lhs("idx.lhs-bits", fac);
    WordyBitVector rhs("idx.rhs-bits", fac);

    // reads: half graft, half host, pre-encoded 2-bit codes
    std::vector<uint8_t> reads(n_reads * read_len);
    for (uint64_t i = 0; i < n_reads; ++i) {
        const auto& g = genomes[i % 2];
        uint64_t s = rng() % (glen - read_len);
        std::copy(g.begin() + s, g.begin() + s + read_len,
                  reads.begin() + i * read_len);
    }

    std::vector<uint64_t> counts(16, 0);
    auto t0 = std::chrono::steady_clock::now();
    std::vector<std::thread> pool;
    std::vector<std::vector<uint64_t>> tcounts(threads,
                                               std::vector<uint64_t>(16, 0));
    for (uint64_t t = 0; t < threads; ++t) {
        pool.emplace_back([&, t]() {
            uint64_t lo = n_reads * t / threads;
            uint64_t hi = n_reads * (t + 1) / threads;
            auto& cnt = tcounts[t];
            for (uint64_t i = lo; i < hi; ++i) {
                const uint8_t* r = &reads[i * read_len];
                uint8_t blrg = 0;
                uint64_t fwd = 0;
                for (int j = 0; j < read_len; ++j) {
                    fwd = ((fwd << 2) | r[j]) & mask;
                    if (j + 1 < (int)k) continue;
                    // --- the GossCmdGroupReads.cc:385-401 k-mer loop ---
                    position_type p(fwd);
                    p.normalize(k);
                    uint64_t rank;
                    if (kmers.accessAndRank(KmerSet::Edge(p), rank)) {
                        uint8_t c = (uint8_t(lhs.get(rank)) << 1)
                                    + uint8_t(rhs.get(rank));
                        blrg |= 1 << c;
                    }
                }
                cnt[blrg] += 1;
            }
        });
    }
    for (auto& th : pool) th.join();
    auto t1 = std::chrono::steady_clock::now();
    double dt = std::chrono::duration<double>(t1 - t0).count();
    for (auto& tc : tcounts)
        for (int i = 0; i < 16; ++i) counts[i] += tc[i];
    std::fprintf(stderr, "# blrg counts:");
    for (int i = 0; i < 16; ++i)
        if (counts[i]) std::fprintf(stderr, " %d:%llu", i,
                                    (unsigned long long)counts[i]);
    std::fprintf(stderr, "\n# classify %.2fs\n", dt);
    std::printf(
        "{\"metric\": \"cpu_classify_reads_per_sec\", \"value\": %.1f, "
        "\"unit\": \"reads/s\", \"threads\": %llu}\n",
        n_reads / dt, (unsigned long long)threads);
    return 0;
}
