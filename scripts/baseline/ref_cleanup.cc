// Gold-parity driver: run the REFERENCE's own cleanup algorithms
// (TourBus pop-bubbles, GossCmdPruneTips tip logic via linearPath) on a
// graph given as our portable dump-graph text, and print the surviving
// edges — so tests can assert our vectorized cleanup makes IDENTICAL
// trim decisions (round-3 VERDICT "gold-parity cleanup").
//
// stdin:  dump-graph text (#version \n K\tcount\tflags \n <seq>\t<count>)
// argv:   pop-bubbles [--cutoff N] [--relative-cutoff F]
//       | prune-tips  [--cutoff N] [--relative-cutoff F]
// stdout: one "<seq>\t<count>" line per SURVIVING edge, ascending.
//
// Compiles /root/reference/src/TourBus.cc, GraphTrimmer.cc, Graph.cc,
// ... unmodified against the boost_shim headers (same recipe as
// make_ref_graph.cc / bench_backyard.cc).

#include <cmath>
#include <cstring>
#include <iostream>
#include <sstream>
#include <string>
#include <vector>

#include "EntryEdgeSet.hh"
#include "Graph.hh"
#include "SmallBaseVector.hh"
#include "GraphTrimmer.hh"
#include "Logger.hh"
#include "StringFileFactory.hh"
#include "TourBus.hh"

using Gossamer::position_type;

static position_type encode(const std::string& s) {
    position_type v(0);
    for (char c : s) {
        int b;
        switch (c) {
            case 'A': b = 0; break;
            case 'C': b = 1; break;
            case 'G': b = 2; break;
            default: b = 3; break;
        }
        v = (v << 2) | position_type(b);
    }
    return v;
}

static std::string decode(position_type v, uint64_t k) {
    static const char* bases = "ACGT";
    std::string s(k, 'A');
    for (uint64_t i = 0; i < k; ++i) {
        s[k - 1 - i] = bases[(v & position_type(3)).asUInt64()];
        v = v >> 2;
    }
    return s;
}

int main(int argc, char** argv) {
    if (argc < 2) {
        std::cerr << "usage: ref_cleanup pop-bubbles|prune-tips "
                     "[--cutoff N] [--relative-cutoff F]\n";
        return 2;
    }
    std::string mode = argv[1];
    uint64_t cutoff = 0;
    double rel_cutoff = 0.0;
    for (int i = 2; i + 1 < argc; i += 2) {
        if (!strcmp(argv[i], "--cutoff")) cutoff = atoll(argv[i + 1]);
        if (!strcmp(argv[i], "--relative-cutoff"))
            rel_cutoff = atof(argv[i + 1]);
    }

    // parse dump text
    std::string line;
    std::getline(std::cin, line);  // #version
    uint64_t K, count, flags;
    std::cin >> K >> count >> flags;
    std::getline(std::cin, line);
    std::vector<std::pair<std::string, uint64_t>> rows;
    rows.reserve(count);
    while (std::getline(std::cin, line)) {
        if (line.empty()) continue;
        size_t tab = line.find('\t');
        rows.emplace_back(line.substr(0, tab),
                          strtoull(line.c_str() + tab + 1, nullptr, 10));
    }

    StringFileFactory fac;
    {
        Graph::Builder b(K, "graph", fac, rows.size());
        for (auto& r : rows)
            b.push_back(encode(r.first), r.second);
        b.end();
    }
    Logger log(std::cerr);

    GraphPtr gPtr = Graph::open("graph", fac);
    Graph& g(*gPtr);

    if (mode == "pop-bubbles") {
        TourBus tb(g, log);
        tb.setNumThreads(1);
        if (cutoff) tb.setCoverageCutoff(cutoff);
        if (rel_cutoff > 0) tb.setCoverageRelativeCutoff(rel_cutoff);
        tb.pass();
        Graph::Builder b(g.K(), "out", fac,
                         g.count() - tb.removedEdgesCount());
        tb.writeModifiedGraph(b);
    } else if (mode == "prune-tips") {
        // LINE-FOR-LINE transcription of the reference's decision loop
        // (/root/reference/src/GossCmdPruneTips.cc:69-254 Block::operator()
        // over one [0, N) range, and the remove-and-iterate driver at
        // :279-320) — including the reference's quirky cutoff line
        // `cutoffCheck && c < mRelCutoff.get()` (:170).
        uint64_t iterations = 1;
        for (int i = 2; i + 1 < argc; i += 2)
            if (!strcmp(argv[i], "--iterate")) iterations = atoll(argv[i + 1]);
        typedef std::pair<Graph::Edge, Gossamer::rank_type> EdgeAndRank;
        for (uint64_t iteration = 0; iteration < iterations; ++iteration) {
            boost::dynamic_bitset<> zapped(g.count());
            std::vector<EdgeAndRank> edges;
            bool cutoffCheck = cutoff > 0;
            bool relCutoffCheck = rel_cutoff > 0;
            for (uint64_t i = 0; i < g.count(); ++i) {
                Graph::Edge beg = g.select(i);
                Graph::Node n = g.from(beg);
                if (g.inDegree(n) != 0) continue;
                edges.clear();
                Graph::Edge end = beg;
                {   // Vis + Graph::linearPath
                    struct V {
                        std::vector<EdgeAndRank>& es;
                        bool operator()(const Graph::Edge& e,
                                        const Gossamer::rank_type& r) {
                            es.push_back(EdgeAndRank(e, r));
                            return true;
                        }
                    } vis{edges};
                    end = g.linearPath(beg, vis);
                }
                uint64_t l = edges.size();
                if (l > 2 * g.K()) continue;
                uint8_t begIn = g.inDegree(g.from(beg));
                uint8_t begOut = g.outDegree(g.from(beg));
                uint8_t endIn = g.inDegree(g.to(end));
                uint8_t endOut = g.outDegree(g.to(end));
                bool begCon = begOut > 1 || begIn > 0;
                bool endCon = endIn > 1 || endOut > 0;
                if (begCon && endCon) continue;
                uint32_t c = 0;
                if (!begCon && endCon) {
                    c = g.multiplicity(end);
                    n = g.reverseComplement(g.to(end));
                } else if (!endCon && begCon) {
                    c = g.multiplicity(beg);
                    n = g.from(beg);
                } else {
                    continue;
                }
                if (cutoffCheck && c < rel_cutoff) continue;  // sic (:170)
                {
                    std::pair<uint64_t, uint64_t> r = g.beginEndRank(n);
                    bool okay = true;
                    uint32_t totalCoverage = 0;
                    for (uint64_t j = r.first; j < r.second; ++j) {
                        uint32_t cov = g.multiplicity(j);
                        totalCoverage += cov;
                        if (cov < c) { okay = false; break; }
                    }
                    if (!okay || (relCutoffCheck &&
                                  c < totalCoverage * rel_cutoff))
                        continue;
                }
                for (uint64_t j = 0; j < edges.size(); ++j) {
                    Graph::Edge x = edges[j].first;
                    Graph::Edge y = g.reverseComplement(x);
                    zapped[edges[j].second] = true;
                    zapped[g.rank(y)] = true;
                }
            }
            g.remove(zapped);
        }
        Graph::Builder b(g.K(), "out", fac, g.count());
        for (Graph::Iterator itr(g); itr.valid(); ++itr) {
            b.push_back((*itr).first.value(), (*itr).second);
        }
        b.end();
    } else if (mode == "print-contigs") {
        // LINE-FOR-LINE transcription of the reference's
        // printLinearSegments (/root/reference/src/GossCmdPrintContigs.cc
        // :49-196, default options: verbose headers on so the stat
        // fields are exercised): FASTA straight to stdout.
        uint64_t minLen = 0, minCov = 0;
        for (int i = 2; i + 1 < argc; i += 2) {
            if (!strcmp(argv[i], "--min-length")) minLen = atoll(argv[i+1]);
            if (!strcmp(argv[i], "--min-coverage")) minCov = atoll(argv[i+1]);
        }
        typedef std::pair<Graph::Edge, Gossamer::rank_type> EdgeAndRank;
        boost::dynamic_bitset<> seen(g.count());
        std::vector<EdgeAndRank> edges;
        SmallBaseVector vec;
        const uint64_t cols = 60;
        uint64_t conitNo = 1;
        for (uint64_t i = 0; i < g.count(); ++i) {
            Graph::Edge e = g.select(i);
            Graph::Node e_f = g.from(e);
            if (g.inDegree(e_f) == 1 && g.outDegree(e_f) == 1) continue;
            if (seen[i]) continue;
            Graph::Edge beg = e;
            edges.clear();
            Graph::Edge end = beg;
            {
                struct V {
                    std::vector<EdgeAndRank>& es;
                    bool operator()(const Graph::Edge& ee,
                                    const Gossamer::rank_type& r) {
                        es.push_back(EdgeAndRank(ee, r));
                        return true;
                    }
                } vis{edges};
                end = g.linearPath(beg, vis);
            }
            Graph::Edge end_rc = g.reverseComplement(end);
            uint64_t end_rc_rnk = g.rank(end_rc);
            seen[i] = true;
            seen[end_rc_rnk] = true;
            uint64_t min_cov = ~0ULL;
            for (uint64_t j = 0; j < edges.size(); ++j) {
                Graph::Edge x = edges[j].first;
                uint64_t x_rnk = edges[j].second;
                uint64_t x_cov = g.multiplicity(x_rnk);
                seen[x_rnk] = true;
                if (x_cov < min_cov) min_cov = x_cov;
                Graph::Edge y = g.reverseComplement(x);
                seen[g.rank(y)] = true;
            }
            Graph::Node fst = g.from(edges.front().first);
            bool includeFst = (g.inDegree(fst) == 0 || g.canonical(fst));
            Graph::Node lst = g.to(edges.back().first);
            bool includeLst = (g.outDegree(lst) == 0 || g.antiCanonical(lst));
            uint64_t len = edges.size() + g.K();
            if (len >= g.K() && !includeFst) len -= g.K();
            if (len >= g.K() && !includeLst) len -= g.K();
            if (len >= minLen && min_cov >= minCov) {
                uint64_t s = 0, s2 = 0, n = edges.size();
                uint64_t minimum = ~0ULL, maximum = 0;
                for (uint64_t j = 0; j < n; ++j) {
                    uint64_t w = g.multiplicity(edges[j].second);
                    s += w;
                    s2 += w * w;
                    if (w > maximum) maximum = w;
                    if (w < minimum) minimum = w;
                }
                double a = static_cast<double>(s) / n;
                double d = sqrt(static_cast<double>(s2) / n - a * a);
                std::cout << '>' << conitNo++ << ' ' << (n + g.K()) << ':'
                          << minimum << ':' << maximum << ':' << a << ':'
                          << d << '\n';
                vec.clear();
                g.seq(edges[0].first, vec);
                for (uint64_t j = 1; j < edges.size(); ++j) {
                    vec.push_back(edges[j].first.value() & 3);
                }
                SmallBaseVector v(vec, (!includeFst) * g.K(), len);
                std::ostringstream os;
                v.print(os, cols);
                std::cout << os.str();
            }
        }
        return 0;
    } else if (mode == "entry-edges") {
        // the reference's own EntryEdgeSet::build
        // (/root/reference/src/EntryEdgeSet.cc:154-290), single thread;
        // dump rows: <entry-edge> <mean-count> <length> <endRank>
        EntryEdgeSet::build(g, "ees", fac, log, 1);
        EntryEdgeSet ees("ees", fac);
        for (uint64_t i = 0; i < ees.count(); ++i) {
            EntryEdgeSet::Edge e = ees.select(i);
            std::cout << decode(position_type(e.value()), K + 1) << '\t'
                      << ees.multiplicity(i) << '\t' << ees.length(i)
                      << '\t' << ees.endRank(i) << '\n';
        }
        return 0;
    } else {
        std::cerr << "unknown mode\n";
        return 2;
    }

    GraphPtr oPtr = Graph::open("out", fac);
    Graph& o(*oPtr);
    for (uint64_t i = 0; i < o.count(); ++i) {
        Graph::Edge e = o.select(i);
        std::cout << decode(position_type(e.value()), K + 1) << '\t'
                  << o.multiplicity(e) << '\n';
    }
    return 0;
}
