// Gold-parity driver: run the REFERENCE's own thread-pairs pipeline
// (EntryEdgeSet::build -> SuperGraph::create -> EdgeIndex::create ->
// PairAligner anchoring -> link aggregation/filter -> ShortestPath
// join loop with consensus/gap-fill) on a graph given as our portable
// dump-graph text plus a read-pair list, and print the surviving
// superpaths — so tests can assert our vectorized thread-pairs makes
// IDENTICAL joining decisions (round-4 VERDICT item 4).
//
// stdin:  dump-graph text, then a line "PAIRS", then one pair per line
//         as "LHS<TAB>RHS" (plain ACGT).
// argv:   --expected-coverage C --insert-expected-size N
//         [--insert-size-std-dev D=10] [--insert-size-tolerance T=2]
//         [--min-link-count M=10] [--orientation pe|mp|inn|out]
//         [--search-radius R=10] [--consolidate-paths 1]
//         [--fill-gaps 1] [--max-gap G]
// stdout: "<contig-seq>\t<seg,seg,...>" per surviving superpath, sorted.
//
// The anonymous-namespace helpers of GossCmdThreadPairs.cc (BiLinkMap,
// LinkMapCompiler/LinkFilter aggregation, shortestPaths,
// findConsensusPath and the join loop,
// /root/reference/src/GossCmdThreadPairs.cc:77-1145) are transcribed
// here because they live inside the command's translation unit;
// PairLinker's orientation/offset algebra is transcribed from
// /root/reference/src/PairLinker.hh:117-258.  PairAligner/KmerAligner
// and SuperGraph/EdgeIndex compile unmodified.

#include <algorithm>
#include <cstring>
#include <iostream>
#include <limits>
#include <map>
#include <set>
#include <sstream>
#include <string>
#include <tuple>
#include <unordered_map>
#include <vector>

#include "EntryEdgeSet.hh"
#include "Graph.hh"
#include "SuperGraph.hh"
#include "EdgeIndex.hh"
#include "KmerAligner.hh"
#include "PairAligner.hh"
#include "PairLinker.hh"
#include "Logger.hh"
#include "StringFileFactory.hh"

using Gossamer::position_type;
using std::vector;
using std::string;
using std::make_pair;
using std::pair;
using std::set;

typedef pair<SuperPathId, SuperPathId> Link;
typedef vector<SuperPathId> Path;
typedef vector<Path> Paths;

namespace {

// GossCmdThreadPairs.cc:229 BiLinkMap (pairs variant), transcribed.
struct BiLinkMap {
    struct UniInfo {
        UniInfo(SuperPathId pOther, int64_t pOffs)
            : mOther(pOther), mOffs(pOffs) {}
        SuperPathId mOther;
        int64_t mOffs;
    };
    typedef vector<UniInfo> UniInfos;
    typedef std::unordered_map<SuperPathId, UniInfos> UniLinkMap;

    int64_t lhsOffs(const Link& pLink) const {
        UniLinkMap::const_iterator l = mLhs.find(pLink.first);
        for (UniInfos::const_iterator i = l->second.begin();
             i != l->second.end(); ++i) {
            if (i->mOther == pLink.second) return i->mOffs;
        }
        return 0;
    }

    int64_t rhsOffs(const Link& pLink) const {
        UniLinkMap::const_iterator r = mRhs.find(pLink.second);
        for (UniInfos::const_iterator i = r->second.begin();
             i != r->second.end(); ++i) {
            if (i->mOther == pLink.first) return i->mOffs;
        }
        return 0;
    }

    void add(const Link& pLink, int64_t pLhsOffs, int64_t pRhsOffs) {
        mLhs[pLink.first].push_back(UniInfo(pLink.second, pLhsOffs));
        mRhs[pLink.second].push_back(UniInfo(pLink.first, pRhsOffs));
    }

    void copy(const Link& pOldLink, const Link& pNewLink) {
        int64_t l(lhsOffs(pOldLink));
        int64_t r(rhsOffs(pOldLink));
        add(pNewLink, l, r);
    }

    void erase(const Link& link) {
        UniLinkMap::iterator lhsIter = mLhs.find(link.first);
        UniInfos& rhss(lhsIter->second);
        for (UniInfos::iterator itr = rhss.begin(); itr != rhss.end();
             ++itr) {
            if (itr->mOther == link.second) {
                rhss.erase(itr);
                break;
            }
        }
        UniLinkMap::iterator rhsIter = mRhs.find(link.second);
        UniInfos& lhss(rhsIter->second);
        for (UniInfos::iterator itr = lhss.begin(); itr != lhss.end();
             ++itr) {
            if (itr->mOther == link.first) {
                lhss.erase(itr);
                break;
            }
        }
    }

    void eraseLhs(SuperPathId pId) {
        UniLinkMap::iterator lhsIter = mLhs.find(pId);
        if (lhsIter == mLhs.end()) return;
        const UniInfos& rs(lhsIter->second);
        for (UniInfos::const_iterator i = rs.begin(); i != rs.end(); ++i) {
            UniLinkMap::iterator rhsIter = mRhs.find(i->mOther);
            UniInfos& ls(rhsIter->second);
            for (UniInfos::iterator j = ls.begin(); j != ls.end(); ++j) {
                if (j->mOther == pId) {
                    ls.erase(j);
                    break;
                }
            }
            if (ls.empty()) mRhs.erase(rhsIter);
        }
        mLhs.erase(lhsIter);
    }

    void eraseRhs(SuperPathId pId) {
        UniLinkMap::iterator rhsIter = mRhs.find(pId);
        if (rhsIter == mRhs.end()) return;
        const UniInfos& ls(rhsIter->second);
        for (UniInfos::const_iterator i = ls.begin(); i != ls.end(); ++i) {
            UniLinkMap::iterator lhsIter = mLhs.find(i->mOther);
            UniInfos& rs(lhsIter->second);
            for (UniInfos::iterator j = rs.begin(); j != rs.end(); ++j) {
                if (j->mOther == pId) {
                    rs.erase(j);
                    break;
                }
            }
            if (rs.empty()) mLhs.erase(lhsIter);
        }
        mRhs.erase(rhsIter);
    }

    void erase(SuperPathId pId) {
        eraseLhs(pId);
        eraseRhs(pId);
    }

    UniLinkMap mLhs;
    UniLinkMap mRhs;
};

// GossCmdThreadPairs.cc:525 shortestPaths, transcribed (Logger elided).
void shortestPaths(SuperGraph& pSG, const SuperPathId& pBegin,
                   const SuperPathId& pEnd, int64_t pInitLen,
                   int64_t pMinLen, int64_t pMaxLen, uint64_t pMaxPaths,
                   uint64_t pSearchRadius, Paths& pPaths) {
    SuperGraph::Node source(pSG.end(pSG[pBegin]));
    SuperGraph::Node sink(pSG.start(pSG[pEnd]));
    uint64_t num_paths = 0;
    for (SuperGraph::ShortestPathIterator
             itr(pSG, source, sink, pMaxLen, pSearchRadius);
         itr.valid() && num_paths <= pMaxPaths; ++itr) {
        const Path& p(*itr);
        ++num_paths;
        int64_t sz = pInitLen;
        for (uint64_t j = 0; j < p.size(); ++j) {
            sz += pSG.size(pSG[p[j]]);
        }
        if (sz > pMaxLen) {
            break;
        }
        if (sz < pMinLen) {
            continue;
        }
        pPaths.push_back(p);
    }
}

// GossCmdThreadPairs.cc:571 distToSegment + :594 findConsensusPath.
bool distToSegment(const SuperGraph& pSG, const Path& pPath,
                   uint64_t pFrom, SuperPathId pSeg, uint64_t& pDist,
                   uint32_t& pCursor) {
    uint64_t d = 0;
    for (uint64_t i = pFrom; i < pPath.size(); ++i) {
        if (pPath[i] == pSeg) {
            pDist += d;
            pCursor = i;
            return true;
        }
        d += pSG.size(pPath[i]);
    }
    return false;
}

void findConsensusPath(SuperGraph& pSG, const Paths& pPaths, Path& pPath) {
    const uint64_t n = pPaths.size();
    pPath.clear();
    vector<uint32_t> cursor(n, 0);
    vector<uint32_t> next(n, 0);
    while (true) {
        for (uint32_t i = 0; i < n; ++i) {
            if (cursor[i] >= pPaths[i].size()) {
                return;
            }
        }
        uint64_t d = 0;
        SuperPathId s = pPaths[0][cursor[0]];
        bool found = true;
        for (uint64_t i = 1; i < n && found; ++i) {
            found = distToSegment(pSG, pPaths[i], cursor[i], s, d, next[i]);
        }
        if (found) {
            d = d / n;
            if (d != 0) {
                pPath.push_back(pSG.gapPath(d));
            }
            pPath.push_back(s);
            cursor[0] += 1;
            for (uint64_t i = 1; i < n; ++i) {
                cursor[i] = next[i] + 1;
            }
        } else {
            cursor[0] += 1;
        }
    }
}

}  // namespace

static position_type encode(const string& s) {
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

// read string -> (kmer, offset) list, the GossRead::Iterator contract
// (sliding rho-window; fixture reads are plain ACGT)
static void readKmers(
    const string& r, uint64_t rho,
    std::vector<std::pair<position_type, uint64_t> >& out) {
    out.clear();
    if (r.size() < rho) return;
    position_type kmer(0);
    position_type mask(position_type(1) << (2 * rho));
    mask -= 1;
    for (uint64_t i = 0; i < r.size(); ++i) {
        int c;
        switch (r[i]) {
            case 'A': c = 0; break;
            case 'C': c = 1; break;
            case 'G': c = 2; break;
            default: c = 3; break;
        }
        kmer = ((kmer << 2) | position_type(c)) & mask;
        if (i + 1 >= rho) out.push_back(make_pair(kmer, i + 1 - rho));
    }
}

int main(int argc, char** argv) {
    uint64_t minLinkCount = 10;
    uint64_t coverage = 0;
    uint64_t cacheRate = 4;
    uint64_t insertSize = 0;
    double stdDev = 10.0, tolerance = 2.0;
    uint64_t searchRadius = 10;
    bool consolidate = false, fillGaps = false;
    uint64_t maxGap = std::numeric_limits<uint64_t>::max();
    PairLinker::Orientation orient = PairLinker::PairedEnds;
    for (int i = 1; i + 1 < argc; i += 2) {
        if (!strcmp(argv[i], "--min-link-count"))
            minLinkCount = atoll(argv[i + 1]);
        if (!strcmp(argv[i], "--expected-coverage"))
            coverage = atoll(argv[i + 1]);
        if (!strcmp(argv[i], "--edge-cache-rate"))
            cacheRate = atoll(argv[i + 1]);
        if (!strcmp(argv[i], "--insert-expected-size"))
            insertSize = atoll(argv[i + 1]);
        if (!strcmp(argv[i], "--insert-size-std-dev"))
            stdDev = atof(argv[i + 1]);
        if (!strcmp(argv[i], "--insert-size-tolerance"))
            tolerance = atof(argv[i + 1]);
        if (!strcmp(argv[i], "--search-radius"))
            searchRadius = atoll(argv[i + 1]);
        if (!strcmp(argv[i], "--consolidate-paths"))
            consolidate = atoi(argv[i + 1]);
        if (!strcmp(argv[i], "--fill-gaps")) fillGaps = atoi(argv[i + 1]);
        if (!strcmp(argv[i], "--max-gap")) maxGap = atoll(argv[i + 1]);
        if (!strcmp(argv[i], "--orientation")) {
            string o = argv[i + 1];
            orient = o == "mp" ? PairLinker::MatePairs
                   : o == "inn" ? PairLinker::Innies
                   : o == "out" ? PairLinker::Outies
                   : PairLinker::PairedEnds;
        }
    }
    if (!coverage || !insertSize) {
        std::cerr << "--expected-coverage and --insert-expected-size are "
                     "required\n";
        return 2;
    }

    // parse dump text + pairs
    string line;
    std::getline(std::cin, line);  // #version
    uint64_t K, count, flags;
    std::cin >> K >> count >> flags;
    std::getline(std::cin, line);
    vector<pair<string, uint64_t> > rows;
    rows.reserve(count);
    vector<pair<string, string> > pairs;
    bool inPairs = false;
    while (std::getline(std::cin, line)) {
        if (line.empty()) continue;
        if (line == "PAIRS") {
            inPairs = true;
            continue;
        }
        size_t tab = line.find('\t');
        if (inPairs) {
            pairs.push_back(make_pair(line.substr(0, tab),
                                      line.substr(tab + 1)));
        } else {
            rows.push_back(make_pair(
                line.substr(0, tab),
                strtoull(line.c_str() + tab + 1, nullptr, 10)));
        }
    }

    StringFileFactory fac;
    {
        Graph::Builder b(K, "graph", fac, rows.size());
        for (auto& r : rows) b.push_back(encode(r.first), r.second);
        b.end();
    }
    Logger log(std::cerr);
    GraphPtr gPtr = Graph::open("graph", fac);
    Graph& g(*gPtr);

    EntryEdgeSet::build(g, "graph-entries", fac, log, 1);
    auto sgp = SuperGraph::create("graph", fac);
    SuperGraph& sg(*sgp);
    const EntryEdgeSet& entries(sg.entries());
    auto idxPtr = EdgeIndex::create(g, entries, sg, cacheRate, 1, log);
    EdgeIndex& idx(*idxPtr);
    const PairAligner alnr(g, entries, idx);
    PairAligner alignerMut(g, entries, idx);  // alignKmers is non-const
    (void)alnr;

    const uint64_t rho = K + 1;
    UniquenessCache ucache(sg, coverage);

    // PairLinker::push_back (PairLinker.hh:117-258), transcribed over
    // (kmer, offset) lists; link tuples collected and std::sorted —
    // the equal-(lhs, rhs) aggregation of ExternalBufferSort +
    // LinkMapCompiler with commutative sums.
    typedef std::tuple<uint64_t, uint64_t, int64_t, int64_t> Rec;
    vector<Rec> recs;
    std::vector<std::pair<position_type, uint64_t> > kbuf;
    for (auto& pr : pairs) {
        SuperPathId lhsId(0), rhsId(0);
        uint64_t lhsOff(0), rhsOff(0);
        bool aligned = false;
        const int64_t lhsReadLen = pr.first.size();
        const int64_t rhsReadLen = pr.second.size();

        auto align = [&](const string& r, SuperPathId& id, uint64_t& off,
                         KmerAligner::Dir dir) {
            readKmers(r, rho, kbuf);
            return alignerMut.alignKmers(kbuf, id, off, dir)
                   && ucache.unique(id);
        };

        switch (orient) {
            case PairLinker::PairedEnds:
            case PairLinker::Innies:
                aligned = align(pr.first, lhsId, lhsOff,
                                KmerAligner::Forward)
                          && align(pr.second, rhsId, rhsOff,
                                   KmerAligner::RevComp);
                break;
            case PairLinker::MatePairs:
                aligned = align(pr.first, rhsId, rhsOff,
                                KmerAligner::Forward)
                          && align(pr.second, lhsId, lhsOff,
                                   KmerAligner::RevComp);
                break;
            case PairLinker::Outies:
                aligned = align(pr.second, rhsId, rhsOff,
                                KmerAligner::Forward)
                          && align(pr.first, lhsId, lhsOff,
                                   KmerAligner::RevComp);
                break;
        }
        if (!aligned) continue;

        SuperPathId rhsRcId = sg.reverseComplement(rhsId);
        SuperPathId lhsRcId = sg.reverseComplement(lhsId);
        const int64_t lhsLen = sg.size(lhsId) + K;
        const int64_t rhsLen = sg.size(rhsRcId) + K;
        int64_t lhsStartOff = 0, rhsEndOff = 0;
        switch (orient) {
            case PairLinker::Innies:
            case PairLinker::MatePairs:
            case PairLinker::PairedEnds:
                lhsStartOff = lhsOff;
                rhsEndOff = rhsOff + K;
                break;
            case PairLinker::Outies:
                lhsStartOff = lhsOff + K + 1 - lhsReadLen;
                rhsEndOff = rhsOff + rhsReadLen - 1;
                break;
        }
        int64_t lhsEndOff = lhsStartOff + lhsReadLen;
        int64_t rhsStartOff = rhsEndOff - rhsReadLen;
        int64_t rhsRcEndOff = rhsLen - rhsStartOff;
        int64_t lhsRcStartOff = lhsLen - lhsEndOff;
        int64_t rhsRcStartOff = rhsRcEndOff - rhsReadLen;
        int64_t lhsRcEndOff = lhsRcStartOff + lhsReadLen;

        if (lhsId != rhsId) {
            recs.push_back(Rec(lhsId.value(), rhsId.value(), lhsStartOff,
                               rhsEndOff));
            recs.push_back(Rec(rhsRcId.value(), lhsRcId.value(),
                               rhsRcStartOff, lhsRcEndOff));
        }
    }

    std::sort(recs.begin(), recs.end());

    // LinkMapCompiler + LinkFilter (GossCmdThreadPairs.cc:78-206)
    const double dev = tolerance * (stdDev / 100.0) * insertSize;
    const int64_t maxInsertSize = insertSize + dev;
    const int64_t minInsertSize = insertSize - dev;
    BiLinkMap biLinks;
    for (uint64_t i = 0; i < recs.size();) {
        uint64_t j = i;
        int64_t lsum = 0, rsum = 0;
        while (j < recs.size()
               && std::get<0>(recs[j]) == std::get<0>(recs[i])
               && std::get<1>(recs[j]) == std::get<1>(recs[i])) {
            lsum += std::get<2>(recs[j]);
            rsum += std::get<3>(recs[j]);
            ++j;
        }
        uint64_t cnt = j - i;
        SuperPathId a(std::get<0>(recs[i])), b(std::get<1>(recs[i]));
        if (cnt >= minLinkCount) {
            int64_t lhsAvg = lsum / (int64_t)cnt;
            int64_t rhsAvg = rsum / (int64_t)cnt;
            int64_t minDist = rhsAvg
                + (int64_t)(sg[a].size(entries) + K) - lhsAvg;
            if (minDist <= maxInsertSize) {
                biLinks.add(make_pair(a, b), lhsAvg, rhsAvg);
            }
        }
        i = j;
    }

    if (getenv("REF_PAIRS_DEBUG")) {
        for (auto& kv : biLinks.mLhs)
            for (auto& v : kv.second)
                std::cerr << "LINK " << kv.first.value() << " -> "
                          << v.mOther.value() << " lhsOff " << v.mOffs
                          << " rhsOff "
                          << biLinks.rhsOffs(make_pair(kv.first, v.mOther))
                          << "\n";
        for (uint64_t i = 0; i < recs.size();) {
            uint64_t j = i;
            while (j < recs.size()
                   && std::get<0>(recs[j]) == std::get<0>(recs[i])
                   && std::get<1>(recs[j]) == std::get<1>(recs[i])) ++j;
            std::cerr << "REC " << std::get<0>(recs[i]) << " -> "
                      << std::get<1>(recs[i]) << " count " << (j - i)
                      << "\n";
            i = j;
        }
    }

    // join loop (GossCmdThreadPairs.cc:932-1145), transcribed
    const double expCov(coverage);
    bool extd;
    do {
        extd = false;
        for (BiLinkMap::UniLinkMap::iterator
                 lhsIter = biLinks.mLhs.begin();
             lhsIter != biLinks.mLhs.end();
             lhsIter = biLinks.mLhs.begin()) {
            SuperPathId a = lhsIter->first;
            BiLinkMap::UniInfos& rhss(lhsIter->second);
            for (uint64_t rhsIx = 0; rhsIx < rhss.size();) {
                SuperPathId b = rhss[rhsIx].mOther;
                Link l(make_pair(a, b));
                if (a == b) {
                    biLinks.erase(l);
                    continue;
                }
                Paths ps;
                const SuperPath& lhs(sg[a]);
                const int64_t initLen =
                    (lhs.size(entries) + K - biLinks.lhsOffs(l))
                    + biLinks.rhsOffs(l);
                const int64_t initGap = std::max(
                    int64_t(0), int64_t(insertSize) - initLen);
                shortestPaths(sg, a, b, initLen, minInsertSize,
                              maxInsertSize, 100, searchRadius, ps);
                if (getenv("REF_PAIRS_DEBUG")) {
                    SuperGraph::SuperPathIds sc;
                    sg.successors(sg.end(sg[a]), sc);
                    std::cerr << "SUCC end(" << a.value() << "):";
                    for (auto& x : sc) std::cerr << ' ' << x.value();
                    SuperGraph::SuperPathIds sc2;
                    for (auto& x : sc) {
                        sc2.clear();
                        sg.successors(sg.end(sg[x]), sc2);
                        std::cerr << " | succ(end(" << x.value() << ")):";
                        for (auto& y : sc2) std::cerr << ' ' << y.value();
                        std::cerr << " size(" << x.value() << ")="
                                  << sg.size(sg[x]);
                    }
                    std::cerr << " sink=start(" << b.value() << ")\n";
                }
                Path p;
                if (getenv("REF_PAIRS_DEBUG")) {
                    std::cerr << "CONSIDER " << a.value() << " -> "
                              << b.value() << " initLen " << initLen
                              << " paths " << ps.size() << "\n";
                }
                if (ps.empty()) {
                    if (fillGaps && initGap < int64_t(maxGap)) {
                        p.clear();
                        p.push_back(a);
                        if (initGap) {
                            p.push_back(sg.gapPath(initGap));
                        }
                        p.push_back(b);
                    } else {
                        biLinks.erase(l);
                        continue;
                    }
                } else if (ps.size() > 1) {
                    if (consolidate) {
                        Path cp;
                        for (uint64_t i = 0; i < ps.size(); ++i) {
                            Path& q(ps[i]);
                            q.insert(q.begin(), a);
                            q.push_back(b);
                        }
                        findConsensusPath(sg, ps, cp);
                        p = cp;
                    } else {
                        biLinks.erase(l);
                        continue;
                    }
                } else {
                    p = ps[ps.size() / 2];
                    p.insert(p.begin(), a);
                    p.push_back(b);
                }

                extd = true;
                if (getenv("REF_PAIRS_DEBUG")) {
                    std::cerr << "JOIN " << a.value() << " -> " << b.value()
                              << " path";
                    for (auto& x : p) std::cerr << ' ' << x.value();
                    std::cerr << "\n";
                }
                SuperPathId aRC = sg.reverseComplement(a);
                SuperPathId bRC = sg.reverseComplement(b);
                uint64_t bSz = sg.size(b);
                uint64_t aRCSz = sg.size(aRC);
                std::pair<SuperPathId, SuperPathId> nl = sg.link(p);
                SuperPathId n = nl.first;
                SuperPathId nRC = nl.second;

                BiLinkMap::UniLinkMap::iterator ui;
                ui = biLinks.mRhs.find(a);
                if (ui != biLinks.mRhs.end()) {
                    for (BiLinkMap::UniInfos::iterator
                             v = ui->second.begin();
                         v != ui->second.end(); ++v) {
                        biLinks.copy(make_pair(v->mOther, a),
                                     make_pair(v->mOther, n));
                    }
                }
                ui = biLinks.mLhs.find(b);
                if (ui != biLinks.mLhs.end()) {
                    for (BiLinkMap::UniInfos::iterator
                             v = ui->second.begin();
                         v != ui->second.end(); ++v) {
                        Link oldLnk(make_pair(b, v->mOther));
                        Link newLnk(make_pair(n, v->mOther));
                        int64_t lo(biLinks.lhsOffs(oldLnk));
                        int64_t ro(biLinks.rhsOffs(oldLnk));
                        lo += sg.size(n) - bSz;
                        biLinks.add(newLnk, lo, ro);
                    }
                }
                ui = biLinks.mLhs.find(aRC);
                if (ui != biLinks.mLhs.end()) {
                    for (BiLinkMap::UniInfos::iterator
                             v = ui->second.begin();
                         v != ui->second.end(); ++v) {
                        Link oldLnk(make_pair(aRC, v->mOther));
                        Link newLnk(make_pair(nRC, v->mOther));
                        int64_t lo(biLinks.lhsOffs(oldLnk));
                        int64_t ro(biLinks.rhsOffs(oldLnk));
                        lo += sg.size(nRC) - aRCSz;
                        biLinks.add(newLnk, lo, ro);
                    }
                }
                ui = biLinks.mRhs.find(bRC);
                if (ui != biLinks.mRhs.end()) {
                    for (BiLinkMap::UniInfos::iterator
                             v = ui->second.begin();
                         v != ui->second.end(); ++v) {
                        biLinks.copy(make_pair(v->mOther, bRC),
                                     make_pair(v->mOther, nRC));
                    }
                }

                set<SuperPathId> deleted;
                for (uint64_t j = 0; j < p.size(); ++j) {
                    SuperPathId s(p[j]);
                    if (getenv("REF_PAIRS_DEBUG"))
                        std::cerr << "UNIQ " << s.value() << " = "
                                  << sg.unique(sg[s], expCov) << "\n";
                    if (!deleted.count(s) && sg.unique(sg[s], expCov)) {
                        const SuperPathId sRC(sg.reverseComplement(s));
                        deleted.insert(s);
                        deleted.insert(sRC);
                        biLinks.erase(s);
                        biLinks.erase(sRC);
                        sg.erase(s);
                    }
                }
                break;
            }
            biLinks.eraseLhs(a);
        }
    } while (extd);

    // surviving superpaths: "<contig-seq>\t<seg,seg,...>", sorted
    vector<string> out;
    for (uint64_t i = 0; i < sg.size(); ++i) {
        SuperPathId id(i);
        if (!sg.valid(id)) continue;
        string seq;
        SuperPathId rcid(0);
        double cov = 0;
        sg.contigInfo(g, id, seq, rcid, cov);
        std::ostringstream os;
        os << seq << '\t';
        const SuperPath sp(sg[id]);
        for (uint64_t j = 0; j < sp.segments().size(); ++j) {
            if (j) os << ',';
            os << sp.segments()[j].mValue;
        }
        out.push_back(os.str());
    }
    std::sort(out.begin(), out.end());
    for (const string& s : out) std::cout << s << '\n';
    return 0;
}
