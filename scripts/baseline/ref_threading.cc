// Gold-parity driver: run the REFERENCE's own thread-reads pipeline
// (EntryEdgeSet::build -> SuperGraph::create -> EdgeIndex::create ->
// KmerAligner read threading -> link filters -> findPath join loop ->
// simplify) on a graph given as our portable dump-graph text plus a
// read list, and print the surviving superpath CONTIG SEQUENCES — so
// tests can assert our vectorized thread-reads makes IDENTICAL joining
// decisions (round-4 VERDICT missing #3 / next-round item 4).
//
// stdin:  dump-graph text (#version \n K\tcount\tflags \n <seq>\t<count>),
//         then a line "READS", then one plain-ACGT read per line.
// argv:   [--min-link-count N] [--expected-coverage C]
//         [--edge-cache-rate R]
// stdout: one contig sequence per surviving superpath (fwd and rc both
//         appear, as SuperGraph holds both), sorted ascending.
//
// Compiles /root/reference/src/{SuperGraph,EdgeIndex,EntryEdgeSet,...}.cc
// unmodified against the boost_shim headers (same recipe as
// ref_cleanup.cc); the anonymous-namespace helpers of
// GossCmdThreadReads.cc (BiLinkMap, SimpleBiLinkMap, ReadLinker's
// chain logic, findPath, linearSegment, simplify and the join loop,
// /root/reference/src/GossCmdThreadReads.cc:83-1060) are transcribed
// here because they live inside the command's translation unit, which
// needs the full boost::program_options App stack to compile.

#include <cstring>
#include <iostream>
#include <limits>
#include <map>
#include <set>
#include <sstream>
#include <string>
#include <unordered_map>
#include <vector>

#include "EntryEdgeSet.hh"
#include "Graph.hh"
#include "SuperGraph.hh"
#include "EdgeIndex.hh"
#include "KmerAligner.hh"
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

namespace std {
template <>
struct hash<Link> {
    std::size_t operator()(const Link& pValue) const {
        BigInteger<2> l(pValue.first.value());
        BigInteger<2> r(pValue.second.value());
        l <<= 64;
        l += r;
        return l.hash();
    }
};
}  // namespace std

namespace {

typedef uint32_t LinkCount;

// GossCmdThreadReads.cc:83 BiLinkMap, transcribed.
struct BiLinkMap {
    typedef std::unordered_map<SuperPathId, vector<SuperPathId> > UniLinkMap;
    typedef std::unordered_map<Link, uint32_t> LinkCountMap;
    typedef std::unordered_map<Link, uint32_t> LinkGapMap;

    void add(SuperPathId a, SuperPathId b, uint32_t g = 0, LinkCount c = 1) {
        add(make_pair(a, b), g, c);
    }

    void add(const Link& l, uint32_t g = 0, LinkCount c = 1) {
        SuperPathId a(l.first);
        SuperPathId b(l.second);
        LinkCountMap::iterator i(mCounts.find(l));
        LinkGapMap::iterator j(mGaps.find(l));
        if (i == mCounts.end()) {
            mLhs[a].push_back(b);
            mRhs[b].push_back(a);
            mCounts[l] = c;
            mGaps[l] = g;
        } else {
            i->second += c;
            j->second += g;
        }
    }

    void swap(BiLinkMap& links) {
        mLhs.swap(links.mLhs);
        mRhs.swap(links.mRhs);
        mCounts.swap(links.mCounts);
        mGaps.swap(links.mGaps);
    }

    LinkCount count(SuperPathId a, SuperPathId b) const {
        LinkCountMap::const_iterator i(mCounts.find(Link(a, b)));
        return i != mCounts.end() ? i->second : 0;
    }

    uint32_t avgGap(SuperPathId a, SuperPathId b) const {
        LinkGapMap::const_iterator i(mGaps.find(Link(a, b)));
        if (i != mGaps.end()) {
            return i->second / count(a, b);
        }
        return 0;
    }

    UniLinkMap mLhs;
    UniLinkMap mRhs;
    LinkCountMap mCounts;
    LinkGapMap mGaps;
};

// GossCmdThreadReads.cc:190 SimpleBiLinkMap, transcribed.
struct SimpleBiLinkMap {
    typedef std::unordered_map<SuperPathId, SuperPathId> UniLinkMap;

    void add(SuperPathId a, SuperPathId b) {
        mLhs.insert(Link(a, b));
        mRhs.insert(Link(b, a));
    }

    void add(SuperPathId a, SuperPathId b, uint32_t g) {
        add(a, b);
        mGaps[Link(a, b)] = g;
    }

    void substLhs(SuperPathId n, SuperPathId a) {
        UniLinkMap::iterator i(mLhs.find(a));
        if (i != mLhs.end()) {
            SuperPathId b = i->second;
            UniLinkMap::iterator j(mRhs.find(b));
            mLhs.erase(i);
            mRhs.erase(j);
            mLhs.insert(make_pair(n, b));
            mRhs.insert(make_pair(b, n));
            std::unordered_map<Link, uint32_t>::iterator k(
                mGaps.find(Link(a, b)));
            uint32_t g = k->second;
            mGaps.erase(k);
            mGaps.insert(make_pair(Link(n, b), g));
        }
    }

    void substRhs(SuperPathId n, SuperPathId b) {
        UniLinkMap::iterator j(mRhs.find(b));
        if (j != mRhs.end()) {
            SuperPathId a = j->second;
            UniLinkMap::iterator i(mLhs.find(a));
            mLhs.erase(i);
            mRhs.erase(j);
            mLhs.insert(make_pair(a, n));
            mRhs.insert(make_pair(n, a));
            std::unordered_map<Link, uint32_t>::iterator k(
                mGaps.find(Link(a, b)));
            uint32_t g = k->second;
            mGaps.erase(k);
            mGaps.insert(make_pair(Link(a, n), g));
        }
    }

    void eraseLhs(SuperPathId a) {
        UniLinkMap::iterator i(mLhs.find(a));
        if (i != mLhs.end()) {
            SuperPathId b(i->second);
            UniLinkMap::iterator j(mRhs.find(b));
            mLhs.erase(i);
            mRhs.erase(j);
            std::unordered_map<Link, uint32_t>::iterator k(
                mGaps.find(Link(a, b)));
            mGaps.erase(k);
        }
    }

    void eraseRhs(SuperPathId b) {
        UniLinkMap::iterator j(mRhs.find(b));
        if (j != mRhs.end()) {
            SuperPathId a(j->second);
            eraseLhs(a);
        }
    }

    UniLinkMap mLhs;
    UniLinkMap mRhs;
    std::unordered_map<Link, uint32_t> mGaps;
};

typedef vector<SuperPathId> Path;

// GossCmdThreadReads.cc:474 findPath (recursive scorer), transcribed.
void findPath(SuperGraph& pSG, const SuperPathId& pAt,
              const SuperPathId& pTo, uint64_t pStepsLeft,
              const uint64_t pGap, Path& pPath, uint64_t pLength,
              vector<pair<uint64_t, Path> >& pPaths) {
    if (pAt == pTo) {
        uint64_t len = pLength - pSG.size(pTo);
        pPaths.push_back(make_pair(len, pPath));
        return;
    }
    if (pLength > pGap * 1.5) {
        return;
    }
    if (pStepsLeft == 0) {
        return;
    }
    SuperGraph::Node n(pSG.end(pAt));
    SuperGraph::SuperPathIds succs;
    pSG.successors(n, succs);
    for (uint64_t i = 0; i < succs.size(); ++i) {
        pPath.push_back(succs[i]);
        uint64_t len = pLength + pSG.size(succs[i]);
        findPath(pSG, succs[i], pTo, pStepsLeft - 1, pGap, pPath, len,
                 pPaths);
        pPath.pop_back();
    }
}

// GossCmdThreadReads.cc:516 findPath (best-of), transcribed.
bool findPath(SuperGraph& pSG, const SuperPathId& pBegin,
              const SuperPathId& pEnd, uint32_t pGap, uint64_t pRadius,
              Path& pPath) {
    if (pGap == 0) {
        pPath.push_back(pEnd);
        return true;
    }
    vector<pair<uint64_t, Path> > paths;
    findPath(pSG, pBegin, pEnd, pRadius, pGap, pPath, 0, paths);
    const Path* bestPath = 0;
    uint64_t bestDiff = std::numeric_limits<uint64_t>::max();
    for (uint64_t i = 0; i < paths.size(); ++i) {
        const pair<uint64_t, Path>& gpath(paths[i]);
        uint64_t diff = llabs(int64_t(pGap) - int64_t(gpath.first));
        if (diff < bestDiff) {
            bestDiff = diff;
            bestPath = &gpath.second;
        }
    }
    if (bestPath) {
        pPath = *bestPath;
        return true;
    }
    return false;
}

// GossCmdThreadReads.cc:570 linearSegment + simplify, transcribed.
void linearSegment(SuperGraph& pSG, SuperPathId pId,
                   vector<SuperPathId>& pPath) {
    SuperPathId p = pId;
    set<SuperPathId> seen;
    pPath.push_back(p);
    seen.insert(p);
    SuperGraph::Node n(pSG.end(p));
    while (pSG.numOut(n) == 1 && pSG.numIn(n) == 1) {
        p = pSG.onlyOut(n);
        if (seen.count(p)) {
            break;
        }
        seen.insert(p);
        pPath.push_back(p);
        n = pSG.end(p);
    }
}

uint64_t simplify(SuperGraph& pSG) {
    uint64_t newPaths = 0;
    set<SuperPathId> seen;
    set<SuperPathId> remd;
    vector<SuperGraph::Node> ns;
    vector<SuperPathId> ids;
    vector<SuperPathId> p;
    pSG.nodes(ns);
    for (uint64_t i = 0; i < ns.size(); ++i) {
        ids.clear();
        remd.clear();
        pSG.successors(ns[i], ids);
        for (uint64_t j = 0; j < ids.size(); ++j) {
            if (!remd.count(ids[j])) {
                p.clear();
                seen.clear();
                linearSegment(pSG, ids[j], p);
                if (p.size() > 1) {
                    newPaths++;
                    pSG.link(p);
                    for (uint64_t k = 0; k < p.size(); ++k) {
                        SuperPathId fd(p[k]);
                        if (!remd.count(fd)) {
                            SuperPathId rc(pSG.reverseComplement(fd));
                            pSG.erase(fd);
                            remd.insert(fd);
                            remd.insert(rc);
                        }
                    }
                }
            }
        }
    }
    return newPaths;
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

int main(int argc, char** argv) {
    uint64_t minLinkCount = 10;
    uint64_t coverage = 0;
    uint64_t cacheRate = 4;
    for (int i = 1; i + 1 < argc; i += 2) {
        if (!strcmp(argv[i], "--min-link-count"))
            minLinkCount = atoll(argv[i + 1]);
        if (!strcmp(argv[i], "--expected-coverage"))
            coverage = atoll(argv[i + 1]);
        if (!strcmp(argv[i], "--edge-cache-rate"))
            cacheRate = atoll(argv[i + 1]);
    }
    if (!coverage) {
        std::cerr << "--expected-coverage is required (the driver has "
                     "no EstimateGraphStatistics)\n";
        return 2;
    }

    // parse dump text + reads
    string line;
    std::getline(std::cin, line);  // #version
    uint64_t K, count, flags;
    std::cin >> K >> count >> flags;
    std::getline(std::cin, line);
    vector<pair<string, uint64_t> > rows;
    rows.reserve(count);
    vector<string> reads;
    bool inReads = false;
    while (std::getline(std::cin, line)) {
        if (line.empty()) continue;
        if (line == "READS") {
            inReads = true;
            continue;
        }
        if (inReads) {
            reads.push_back(line);
        } else {
            size_t tab = line.find('\t');
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

    const uint64_t rho = K + 1;
    UniquenessCache ucache(sg, coverage);
    KmerAligner aligner(g, entries, idx);

    // ReadLinker::push_back chain logic (GossCmdThreadReads.cc:329-385)
    // over plain-ACGT read strings; GossRead::Iterator reduces to a
    // sliding rho-window here (fixture reads contain no Ns).
    BiLinkMap links;
    for (const string& r : reads) {
        bool primed = false;
        SuperPathId a(0), b(0);
        uint32_t gap = 0;
        if (r.size() < rho) continue;
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
            if (i + 1 < rho) continue;
            SuperPathId id(0);
            if (aligner(kmer, id)) {
                if (ucache.unique(id)) {
                    if (!primed) {
                        b = id;
                        gap = 0;
                        primed = true;
                    } else if (id != b) {
                        a = b;
                        b = id;
                        links.add(a, b, gap);
                        gap = 0;
                    }
                } else {
                    gap += 1;
                }
            } else {
                gap += 1;
            }
        }
    }

    // link filters (GossCmdThreadReads.cc:795-890), transcribed
    {
        BiLinkMap goodLinks;
        for (BiLinkMap::UniLinkMap::const_iterator i = links.mLhs.begin();
             i != links.mLhs.end(); ++i) {
            SuperPathId a(i->first);
            const vector<SuperPathId>& bs(i->second);
            for (vector<SuperPathId>::const_iterator j = bs.begin();
                 j != bs.end(); ++j) {
                SuperPathId b(*j);
                if (uint64_t(links.count(a, b)) < minLinkCount) continue;
                goodLinks.add(a, b, links.avgGap(a, b));
            }
        }
        links.swap(goodLinks);
    }
    {
        BiLinkMap goodLinks;
        for (BiLinkMap::UniLinkMap::const_iterator i = links.mLhs.begin();
             i != links.mLhs.end(); ++i) {
            SuperPathId a(i->first);
            const vector<SuperPathId>& rs(i->second);
            if (rs.size() == 1) {
                const SuperPathId b(rs.front());
                goodLinks.add(a, b, links.avgGap(a, b));
            } else {
                SuperPathId b(0);
                uint32_t c(0);
                for (uint64_t j = 0; j < rs.size(); ++j) {
                    SuperPathId x(rs[j]);
                    uint32_t k = links.count(a, x);
                    if (k > c) {
                        c = k;
                        b = x;
                    }
                }
                goodLinks.add(a, b, links.avgGap(a, b));
            }
        }
        links.swap(goodLinks);
    }
    {
        BiLinkMap goodLinks;
        for (BiLinkMap::UniLinkMap::const_iterator i = links.mRhs.begin();
             i != links.mRhs.end(); ++i) {
            SuperPathId b(i->first);
            const vector<SuperPathId>& ls(i->second);
            if (ls.size() == 1) {
                const SuperPathId a(ls.front());
                goodLinks.add(a, b, links.avgGap(a, b));
            } else {
                SuperPathId a(0);
                uint32_t c(0);
                for (uint64_t j = 0; j < ls.size(); ++j) {
                    SuperPathId x(ls[j]);
                    uint32_t k = links.count(x, b);
                    if (k > c) {
                        c = k;
                        a = x;
                    }
                }
                goodLinks.add(a, b, links.avgGap(a, b));
            }
        }
        links.swap(goodLinks);
    }

    if (getenv("REF_THREADING_DEBUG")) {
        for (auto& kv : links.mCounts) {
            std::cerr << "LINK " << kv.first.first.value() << " -> "
                      << kv.first.second.value() << " count " << kv.second
                      << " gapsum " << links.mGaps[kv.first] << "\n";
        }
    }
    SimpleBiLinkMap lnks;
    for (BiLinkMap::UniLinkMap::const_iterator i = links.mLhs.begin();
         i != links.mLhs.end(); ++i) {
        SuperPathId a = i->first;
        SuperPathId b = i->second.front();
        std::unordered_map<Link, uint32_t>::const_iterator j(
            links.mGaps.find(Link(a, b)));
        uint32_t gp = j == links.mGaps.end() ? 0 : j->second;
        lnks.add(a, b, gp);
    }

    // join loop (GossCmdThreadReads.cc:928-1045), transcribed
    bool extd = false;
    do {
        extd = false;
        for (SimpleBiLinkMap::UniLinkMap::iterator
                 lhsIter = lnks.mLhs.begin();
             lhsIter != lnks.mLhs.end(); lhsIter = lnks.mLhs.begin()) {
            SuperPathId a(lhsIter->first);
            SuperPathId b(lhsIter->second);
            SuperPathId aRC = sg.reverseComplement(a);
            SuperPathId bRC = sg.reverseComplement(b);
            uint32_t gap = lnks.mGaps[Link(a, b)];

            lnks.eraseLhs(a);
            lnks.eraseRhs(b);
            lnks.eraseLhs(bRC);
            lnks.eraseRhs(aRC);

            if (a == b || a == aRC || b == bRC) {
                continue;
            }

            bool joined = false;
            Path p(1, a);
            if (findPath(sg, a, b, gap, 5, p)) {
                joined = true;
            }
            if (getenv("REF_THREADING_DEBUG")) {
                std::cerr << "JOIN " << a.value() << " -> " << b.value()
                          << " gap " << gap << " joined " << joined
                          << " path";
                for (auto& x : p) std::cerr << ' ' << x.value();
                std::cerr << "\n";
            }

            if (joined) {
                extd = true;
                std::pair<SuperPathId, SuperPathId> l = sg.link(p);
                SuperPathId n = l.first;
                SuperPathId nRC = l.second;

                SimpleBiLinkMap::UniLinkMap::iterator ui;
                ui = lnks.mRhs.find(a);
                if (ui != lnks.mRhs.end()) {
                    lnks.substRhs(n, a);
                }
                ui = lnks.mLhs.find(b);
                if (ui != lnks.mLhs.end()) {
                    lnks.substLhs(n, b);
                }
                ui = lnks.mLhs.find(aRC);
                if (ui != lnks.mLhs.end()) {
                    lnks.substLhs(nRC, aRC);
                }
                ui = lnks.mRhs.find(bRC);
                if (ui != lnks.mRhs.end()) {
                    lnks.substRhs(nRC, bRC);
                }

                sg.erase(a);
                if (b != a && b != aRC) {
                    sg.erase(b);
                }
            }
        }
    } while (extd);

    simplify(sg);

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

    // optional: dump the reference-format .supergraph file set written
    // by the REFERENCE's own SuperGraph::write (src/SuperGraph.cc:892)
    // as hex lines, for read-interop tests
    for (int i = 1; i < argc; ++i) {
        if (strcmp(argv[i], "--dump-supergraph")) continue;
        sg.write("graph", fac);
        static const char* suffixes[] = {
            ".header", ".next-id", ".count", ".succ.nodes",
            ".succ.num-path-ids", ".succ.path-ids",
            ".segs.num-segments", ".segs.segments", ".rcs.rc-path-ids"};
        for (const char* sfx : suffixes) {
            string data = fac.readFile(string("graph-supergraph") + sfx);
            std::cout << "FILE graph-supergraph" << sfx << ' ';
            static const char* hex = "0123456789abcdef";
            for (unsigned char c : data) {
                std::cout << hex[c >> 4] << hex[c & 15];
            }
            std::cout << '\n';
        }
    }
    return 0;
}
