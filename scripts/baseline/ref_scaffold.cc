// Gold-parity driver: run the REFERENCE's own build-scaffold + scaffold
// pipeline (PairLinker -> ScaffoldGraph::Builder -> mergeRcs ->
// linearise with near/mid placement, relaxation and 7-mer end
// alignment -> gap superpaths) on a graph given as our portable
// dump-graph text plus a read-pair list, and print the surviving
// superpaths — so tests can assert our vectorized build-scaffold +
// scaffold make IDENTICAL placements (round-4 VERDICT item 4).
//
// stdin/argv: as ref_pairs.cc (PAIRS section; --min-link-count applies
// at ScaffoldGraph::read, as in the scaffold command).
// stdout: "<contig-seq>\t<seg,seg,...>" per surviving superpath, sorted
//         (gap segments print under SuperPath's own tagged encoding).
//
// ScaffoldGraph/SuperGraph/EdgeIndex/PairAligner compile unmodified;
// the scaffold command's anonymous-namespace helpers (getPrefix/
// getSuffix/alignEnds/enqueue/calculateBounds/placeNear/placeMid/
// linearise and the linking tail, /root/reference/src/
// GossCmdScaffold.cc:39-786) and build-scaffold's aggregation
// (GossCmdBuildScaffold.cc:74-195, count-filter-free LinkFilter) are
// transcribed here because they live inside command translation units.

#include <algorithm>
#include <cstring>
#include <iostream>
#include <limits>
#include <map>
#include <queue>
#include <set>
#include <sstream>
#include <string>
#include <tuple>
#include <unordered_map>
#include <unordered_set>
#include <vector>

#include "EntryEdgeSet.hh"
#include "Graph.hh"
#include "SuperGraph.hh"
#include "ScaffoldGraph.hh"
#include "EdgeIndex.hh"
#include "KmerAligner.hh"
#include "PairAligner.hh"
#include "PairLinker.hh"
#include "Logger.hh"
#include "SmallBaseVector.hh"
#include "StringFileFactory.hh"

using Gossamer::position_type;
using std::vector;
using std::string;
using std::make_pair;
using std::pair;
using std::set;

namespace {

// GossCmdScaffold.cc:41-128 PrefixVis/getPrefix/getSuffix, transcribed.
class PrefixVis {
public:
    uint64_t stepsLeft() const { return mStepsLeft; }
    const SmallBaseVector& getVector() const { return mVec; }
    void restart(uint64_t pExtraBases) { mExtraBases = pExtraBases; }

    uint64_t operator()(Graph::Edge pEdge, const Gossamer::rank_type&) {
        if (mStepsLeft == 0) {
            return false;
        }
        Gossamer::position_type p(pEdge.value());
        if (mExtraBases) {
            const uint64_t K = mGraph.K();
            const uint64_t rho = K + 1;
            p.reverse();
            uint64_t shift =
                std::numeric_limits<Gossamer::position_type>::digits
                - 2 * rho;
            shift += 2 * (K - mExtraBases);
            p >>= shift;
            for (uint64_t i = 0; i < mExtraBases && mStepsLeft; ++i) {
                mVec.push_back(p & 3);
                p >>= 2;
                --mStepsLeft;
            }
            mExtraBases = 0;
            if (mStepsLeft == 0) {
                return false;
            }
        }
        mVec.push_back(p & 3);
        return --mStepsLeft;
    }

    PrefixVis(const Graph& pGraph, uint64_t pMaxSteps)
        : mGraph(pGraph), mStepsLeft(pMaxSteps),
          mExtraBases(mGraph.K()), mVec() {}

private:
    const Graph& mGraph;
    uint64_t mStepsLeft;
    uint64_t mExtraBases;
    SmallBaseVector mVec;
};

void getPrefix(const Graph& pG, const SuperGraph& pSG, SuperPathId pId,
               uint64_t pBases, SmallBaseVector& pVec) {
    PrefixVis vis(pG, pBases);
    const SuperPath p(pSG[pId]);
    const SuperPath::Segments& segs(p.segments());
    for (uint64_t i = 0; i < segs.size() && vis.stepsLeft(); ++i) {
        const SuperPath::Segment seg(segs[i]);
        if (seg.isGap()) {
            vis.restart(seg.gap());
            continue;
        }
        EntryEdgeSet::Edge e(pSG.entries().select(seg.linearPath()));
        pG.linearPath(Graph::Edge(e.value()), vis);
    }
    pVec = vis.getVector();
}

void getSuffix(const Graph& pG, const SuperGraph& pSG, SuperPathId pId,
               uint64_t pBases, SmallBaseVector& pVec) {
    SuperPathId rcId(pSG.reverseComplement(pId));
    SmallBaseVector vecRc;
    pVec.clear();
    getPrefix(pG, pSG, rcId, pBases, vecRc);
    vecRc.reverseComplement(pVec);
}

// GossCmdScaffold.cc:140-215 alignEnds, transcribed.
bool alignEnds(const SmallBaseVector& pA, const SmallBaseVector& pB,
               int64_t pEst, int64_t& pAln) {
    typedef std::unordered_map<Gossamer::position_type,
                               vector<int64_t> > OfsMap;
    const int64_t lenA = pA.size();
    OfsMap ofs;
    const int64_t K = 7;
    for (int64_t i = 0; i < lenA - K + 1; ++i) {
        int64_t of = i - lenA;
        Gossamer::position_type kmer(pA.kmer(K, i));
        ofs[kmer].push_back(of);
    }
    std::unordered_map<int64_t, uint64_t> alns;
    const int64_t lenB = pB.size();
    for (int64_t i = 0; i < lenB - K + 1; ++i) {
        Gossamer::position_type kmer(pB.kmer(K, i));
        OfsMap::iterator it = ofs.find(kmer);
        if (it == ofs.end()) {
            continue;
        }
        const vector<int64_t>& of(it->second);
        for (vector<int64_t>::const_iterator j = of.begin();
             j != of.end(); ++j) {
            const int64_t aln = *j - int64_t(i);
            ++alns[aln];
        }
    }
    for (std::unordered_map<int64_t, uint64_t>::iterator
             i = alns.begin(); i != alns.end();) {
        int64_t a = -i->first;
        int64_t h = i->second;
        if (h >= (a - int64_t(K) + 1) / 2) {
            ++i;
        } else {
            i = alns.erase(i);
        }
    }
    if (alns.empty()) {
        return false;
    }
    std::unordered_map<int64_t, uint64_t>::const_iterator i = alns.begin();
    int64_t aln = i->first;
    int64_t minDiff = llabs(aln - pEst);
    ++i;
    for (; i != alns.end(); ++i) {
        int64_t diff = llabs(i->first - pEst);
        if (diff < minDiff) {
            aln = i->first;
            minDiff = diff;
        }
    }
    pAln = aln;
    return true;
}

typedef std::unordered_map<SuperPathId, int64_t> DistMap;
typedef std::multimap<int64_t, SuperPathId> InvDistMap;
typedef boost::tuple<double, SuperPathId, int64_t> QueueEntry;

// GossCmdScaffold.cc:221-256 QueueEntryLt, transcribed.
struct QueueEntryLt {
    bool operator()(const QueueEntry& pX, const QueueEntry pY) const {
        if (pX.get<0>() < pY.get<0>()) return true;
        if (pX.get<0>() > pY.get<0>()) return false;
        if (pX.get<1>() < pY.get<1>()) return true;
        if (pX.get<1>() > pY.get<1>()) return false;
        if (pX.get<2>() < pY.get<2>()) return true;
        if (pX.get<2>() > pY.get<2>()) return false;
        return false;
    }
};

typedef std::priority_queue<QueueEntry, vector<QueueEntry>, QueueEntryLt>
    Queue;

// GossCmdScaffold.cc:265-303 enqueue, transcribed.
void enqueue(const SuperGraph& pSg, const ScaffoldGraph& pScaf,
             const DistMap& pSeen, Queue& pQueue, SuperPathId pNode,
             int64_t pPos) {
    const ScaffoldGraph::Edges& froms(pScaf.getFroms(pNode));
    for (ScaffoldGraph::Edges::const_iterator i = froms.begin();
         i != froms.end(); ++i) {
        SuperPathId n = i->get<0>();
        if (!pSeen.count(n)) {
            int64_t size = pSg.baseSize(n);
            int64_t gap = i->get<1>();
            int64_t pos = pPos - (gap + size);
            int64_t count = i->get<2>();
            double prio = count;
            pQueue.push(QueueEntry(prio, n, pos));
        }
    }
    const ScaffoldGraph::Edges& tos(pScaf.getTos(pNode));
    const int64_t endPos = pPos + pSg.baseSize(pNode);
    for (ScaffoldGraph::Edges::const_iterator i = tos.begin();
         i != tos.end(); ++i) {
        SuperPathId n = i->get<0>();
        if (!pSeen.count(n)) {
            int64_t gap = i->get<1>();
            int64_t pos = endPos + gap;
            int64_t count = i->get<2>();
            double prio = count;
            pQueue.push(QueueEntry(prio, n, pos));
        }
    }
}

// GossCmdScaffold.cc:312-410 calculateBounds/placeNear/placeMid.
bool calculateBounds(const SuperGraph& pSg, const ScaffoldGraph& pScaf,
                     const DistMap& pDist, SuperPathId pNode,
                     int64_t& pMinPos, int64_t& pMaxPos) {
    const int64_t nodeSize = pSg.baseSize(pNode);
    const ScaffoldGraph::Edges& froms(pScaf.getFroms(pNode));
    const ScaffoldGraph::Edges& tos(pScaf.getTos(pNode));
    int64_t posMin = std::numeric_limits<int64_t>::min();
    int64_t posMax = std::numeric_limits<int64_t>::max();
    bool constrained = false;
    for (ScaffoldGraph::Edges::const_iterator i = froms.begin();
         i != froms.end(); ++i) {
        SuperPathId n(i->get<0>());
        DistMap::const_iterator j = pDist.find(n);
        if (j != pDist.end()) {
            constrained = true;
            int64_t halfRange = i->get<3>() / 2;
            const int64_t edgePos =
                j->second + pSg.baseSize(n) + i->get<1>();
            posMin = std::max(posMin, edgePos - halfRange);
            posMax = std::min(posMax, edgePos + halfRange);
        }
    }
    for (ScaffoldGraph::Edges::const_iterator i = tos.begin();
         i != tos.end(); ++i) {
        SuperPathId n(i->get<0>());
        DistMap::const_iterator j = pDist.find(n);
        if (j != pDist.end()) {
            constrained = true;
            int64_t halfRange = i->get<3>() / 2;
            const int64_t edgePos =
                j->second - (i->get<1>() + nodeSize);
            posMin = std::max(posMin, edgePos - halfRange);
            posMax = std::min(posMax, edgePos + halfRange);
        }
    }
    pMinPos = posMin;
    pMaxPos = posMax;
    return constrained;
}

enum Placement { Unconstrained, Unplaced, Placed };

Placement placeNear(const SuperGraph& pSg, const ScaffoldGraph& pScaf,
                    const DistMap& pDist, SuperPathId pNode,
                    int64_t pTarget, int64_t& pPlace) {
    int64_t posMin, posMax;
    bool constrained =
        calculateBounds(pSg, pScaf, pDist, pNode, posMin, posMax);
    if (!constrained) {
        return Unconstrained;
    }
    if (posMin > posMax) {
        return Unplaced;
    }
    pPlace = pTarget < posMin ? posMin
           : pTarget > posMax ? posMax
           : pTarget;
    return Placed;
}

Placement placeMid(const SuperGraph& pSg, const ScaffoldGraph& pScaf,
                   const DistMap& pDist, SuperPathId pNode,
                   int64_t& pPlace) {
    int64_t posMin, posMax;
    if (!calculateBounds(pSg, pScaf, pDist, pNode, posMin, posMax)) {
        return Unconstrained;
    }
    pPlace = (posMax + posMin) / 2;
    return Placed;
}

void invertDistanceMap(const DistMap& pDistMap, InvDistMap& pInvDistMap) {
    pInvDistMap.clear();
    for (DistMap::const_iterator i = pDistMap.begin();
         i != pDistMap.end(); ++i) {
        pInvDistMap.insert(make_pair(i->second, i->first));
    }
}

// GossCmdScaffold.cc:437-605 linearise, transcribed.
bool linearise(const Graph& pG, const SuperGraph& pSg,
               const ScaffoldGraph& pScaf,
               const std::unordered_set<SuperPathId>& pAvail,
               InvDistMap& pInvDistMap) {
    SuperPathId start(0);
    bool foundStart = false;
    for (std::unordered_set<SuperPathId>::const_iterator
             i = pAvail.begin(); i != pAvail.end(); ++i) {
        const ScaffoldGraph::Edges& tos(pScaf.getTos(*i));
        const ScaffoldGraph::Edges& froms(pScaf.getFroms(*i));
        bool outs = false;
        for (ScaffoldGraph::Edges::const_iterator j = tos.begin();
             j != tos.end(); ++j) {
            if (pAvail.count(j->get<0>())) {
                outs = true;
                break;
            }
        }
        if (outs) {
            bool ins = false;
            for (ScaffoldGraph::Edges::const_iterator j = froms.begin();
                 j != froms.end(); ++j) {
                if (pAvail.count(j->get<0>())) {
                    ins = true;
                    break;
                }
            }
            if (!ins) {
                foundStart = true;
                start = *i;
                break;
            }
        }
    }
    if (!foundStart) {
        return false;
    }

    DistMap ord;
    ord.insert(make_pair(start, 0));
    Queue q;
    enqueue(pSg, pScaf, ord, q, start, 0);
    while (!q.empty()) {
        QueueEntry qe = q.top();
        q.pop();
        const SuperPathId n = qe.get<1>();
        const SuperPathId nRc = pSg.reverseComplement(n);
        const int64_t d = qe.get<2>();
        if (!ord.count(n) && !ord.count(nRc) && pAvail.count(n)) {
            ord.insert(make_pair(n, d));
            enqueue(pSg, pScaf, ord, q, n, d);
        }
    }

    InvDistMap ids;
    for (DistMap::const_iterator i = ord.begin(); i != ord.end(); ++i) {
        ids.insert(make_pair(i->second, i->first));
    }
    {
        DistMap ds;
        InvDistMap::const_iterator i = ids.begin();
        int64_t x = i->first;
        SuperPathId n = i->second;
        int64_t nSize = pSg.baseSize(n);
        int64_t end = x + nSize;
        ds.insert(make_pair(n, x));
        for (++i; i != ids.end(); ++i) {
            x = i->first;
            n = i->second;
            nSize = pSg.baseSize(n);
            int64_t pos = 0;
            Placement p = placeNear(pSg, pScaf, ds, n, end, pos);
            if (p == Placed) {
                ds.insert(make_pair(n, pos));
                end = pos + nSize;
            }
        }
        for (uint64_t j = 0; j < 5; ++j) {
            for (DistMap::iterator i2 = ds.begin(); i2 != ds.end();
                 ++i2) {
                int64_t pos = 0;
                Placement p = placeMid(pSg, pScaf, ds, i2->first, pos);
                (void)p;
                i2->second = pos;
            }
        }
        invertDistanceMap(ds, ids);

        ds.clear();
        InvDistMap::iterator cur = ids.begin();
        InvDistMap::iterator next = cur;
        ++next;
        const int64_t K(pG.K());
        int64_t move = 0;
        for (; next != ids.end(); ++cur, ++next) {
            ds.insert(make_pair(cur->second, cur->first + move));
            SmallBaseVector curVec, nextVec;
            getSuffix(pG, pSg, cur->second, K, curVec);
            getPrefix(pG, pSg, next->second, K, nextVec);
            const int64_t curEnd =
                cur->first + pSg.baseSize(cur->second);
            const int64_t estGap = next->first - curEnd;
            int64_t aln = 0;
            if (estGap < 0) {
                if (!alignEnds(curVec, nextVec, estGap, aln)
                    || aln < -K) {
                    move += -estGap;
                } else {
                    move += aln - estGap;
                }
            }
        }
        ds.insert(make_pair(cur->second, cur->first + move));
        invertDistanceMap(ds, ids);
    }
    pInvDistMap.swap(ids);
    return true;
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
        if (!strcmp(argv[i], "--orientation")) {
            string o = argv[i + 1];
            orient = o == "mp" ? PairLinker::MatePairs
                   : o == "inn" ? PairLinker::Innies
                   : o == "out" ? PairLinker::Outies
                   : PairLinker::PairedEnds;
        }
    }
    if (!coverage || !insertSize) {
        std::cerr << "--expected-coverage and --insert-expected-size "
                     "required\n";
        return 2;
    }

    string line;
    std::getline(std::cin, line);
    uint64_t K, count, flags;
    std::cin >> K >> count >> flags;
    std::getline(std::cin, line);
    vector<pair<string, uint64_t> > rows;
    vector<pair<string, string> > prs;
    bool inPairs = false;
    while (std::getline(std::cin, line)) {
        if (line.empty()) continue;
        if (line == "PAIRS") {
            inPairs = true;
            continue;
        }
        size_t tab = line.find('\t');
        if (inPairs) {
            prs.push_back(make_pair(line.substr(0, tab),
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
    PairAligner alignerMut(g, entries, idx);
    const uint64_t rho = K + 1;
    UniquenessCache ucache(sg, coverage);

    // PairLinker collection (identical to ref_pairs.cc)
    typedef std::tuple<uint64_t, uint64_t, int64_t, int64_t> Rec;
    vector<Rec> recs;
    std::vector<std::pair<position_type, uint64_t> > kbuf;
    for (auto& pr : prs) {
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

    // build-scaffold: aggregation -> maxInsert filter -> Builder
    // (GossCmdBuildScaffold.cc:424-443; its LinkFilter has NO count
    // filter — the count threshold applies at ScaffoldGraph::read)
    const double dev = tolerance * (stdDev / 100.0) * insertSize;
    const uint64_t maxInsertSize = insertSize + dev;
    const uint64_t insertRange = 2 * dev;
    {
        ScaffoldGraph::Builder builder("graph-scaf.0", fac, sg,
                                       insertSize, insertRange, orient);
        for (uint64_t i = 0; i < recs.size();) {
            uint64_t j = i;
            int64_t lsum = 0, lsum2 = 0, rsum = 0, rsum2 = 0;
            while (j < recs.size()
                   && std::get<0>(recs[j]) == std::get<0>(recs[i])
                   && std::get<1>(recs[j]) == std::get<1>(recs[i])) {
                int64_t l = std::get<2>(recs[j]);
                int64_t r = std::get<3>(recs[j]);
                lsum += l;
                lsum2 += l * l;
                rsum += r;
                rsum2 += r * r;
                ++j;
            }
            uint64_t cnt = j - i;
            SuperPathId a(std::get<0>(recs[i])), b(std::get<1>(recs[i]));
            int64_t lhsAvg = lsum / (int64_t)cnt;
            int64_t rhsAvg = rsum / (int64_t)cnt;
            int64_t minDist = rhsAvg
                + (int64_t)(sg[a].size(entries) + K) - lhsAvg;
            if (minDist <= (int64_t)maxInsertSize) {
                builder.push_back(a, b, cnt, lsum, lsum2, rsum, rsum2);
            }
            i = j;
        }
        builder.end();
    }

    // scaffold command (GossCmdScaffold.cc:612-786), transcribed
    auto scafP = ScaffoldGraph::read("graph", fac, minLinkCount);
    ScaffoldGraph& scaf(*scafP);
    scaf.mergeRcs(sg);

    std::unordered_set<SuperPathId> left;
    scaf.getNodes(left);
    InvDistMap ids;
    while (!left.empty()) {
        if (!linearise(g, sg, scaf, left, ids)) {
            break;
        }
        for (InvDistMap::const_iterator i = ids.begin(); i != ids.end();
             ++i) {
            left.erase(i->second);
            left.erase(sg.reverseComplement(i->second));
        }
        if (ids.size() < 2) {
            continue;
        }
        InvDistMap::const_iterator i = ids.begin();
        SuperPathId cur(i->second);
        int64_t curEnd(i->first + sg.baseSize(cur));
        for (++i; i != ids.end(); ++i) {
            const SuperPathId next(i->second);
            const int64_t nextPos(i->first);
            int64_t gap = nextPos - curEnd;
            curEnd = nextPos + sg.baseSize(next);
            vector<SuperPathId> p;
            p.push_back(cur);
            p.push_back(sg.gapPath(gap));
            p.push_back(next);
            pair<SuperPathId, SuperPathId> ns = sg.link(p);
            sg.erase(p[0]);
            sg.erase(p[1]);
            sg.erase(p[2]);
            cur = ns.first;
        }
    }

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
