// Interop fixture generator: writes a REFERENCE-format graph using the
// reference's own Graph::Builder (compiled unmodified from
// /root/reference/src against the Boost shims in boost_shim/).
//
// stdin:  our portable dump-graph text (#version \n K\tcount\tflags \n
//         <seq>\t<count> lines, ascending) — i.e. the output of
//         `goss dump-graph`.
// argv:   <output-directory> [basename=graph]
//
// The graph is built through a StringFileFactory (no mmap, no
// boost::iostreams) and the known file set is then written to the
// output directory, producing exactly the artifact `goss build-graph`
// of the reference would leave on disk (Graph.cc:164-190,
// SparseArray.cc:106-133, VariableByteArray.cc:35-41).

#include <fstream>
#include <iostream>
#include <sstream>
#include <string>
#include <vector>

#include "Graph.hh"
#include "KmerSet.hh"
#include "StringFileFactory.hh"

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

int main(int argc, char** argv) {
    if (argc < 2) {
        std::cerr << "usage: make_ref_graph <outdir> [basename]\n";
        return 2;
    }
    std::string outdir = argv[1];
    std::string base = argc > 2 ? argv[2] : "graph";
    // third arg "kmer-set" switches to dump-kmer-set input
    // (#version \n K\tcount \n <seq> lines) and KmerSet::Builder
    bool kmerSet = argc > 3 && std::string(argv[3]) == "kmer-set";

    std::string line;
    std::getline(std::cin, line);  // #version
    std::getline(std::cin, line);  // K \t count [\t flags]
    std::istringstream hdr(line);
    uint64_t K = 0, count = 0, flags = 0;
    hdr >> K >> count >> flags;

    StringFileFactory fac;
    if (kmerSet) {
        KmerSet::Builder b(K, base, fac, count);
        while (std::getline(std::cin, line)) {
            if (line.empty()) continue;
            b.push_back(encode(line));
        }
        b.end();
    } else {
        Graph::Builder b(K, base, fac, count, flags & 1);
        uint64_t n = 0;
        while (std::getline(std::cin, line)) {
            if (line.empty()) continue;
            size_t tab = line.find('\t');
            std::string seq = line.substr(0, tab);
            uint32_t c = std::stoul(line.substr(tab + 1));
            b.push_back(encode(seq), c);
            ++n;
        }
        b.end();
        if (n != count) {
            std::cerr << "edge count mismatch: " << n << " vs " << count
                      << "\n";
            return 1;
        }
    }

    // the reference graph file set (Graph.cc, SparseArray.cc,
    // DenseArray.cc:817-820, VariableByteArray.cc:35-41)
    std::vector<std::string> names = {".header", "-counts-hist.txt"};
    std::vector<std::string> sub = {"-edges", ".kmers", "-counts.ord1p",
                                    "-counts.ord2p"};
    for (auto& s : sub) {
        names.push_back(s + ".header");
        names.push_back(s + ".high-bits");
        for (auto& low :
             {std::string(".low-bits"), std::string(".low-bits.lwr"),
              std::string(".low-bits.upr"), std::string(".low-bits.lwr.lwr"),
              std::string(".low-bits.lwr.upr"),
              std::string(".low-bits.upr.lwr"),
              std::string(".low-bits.upr.upr")})
            names.push_back(s + low);
        for (auto& d : {std::string("-d0"), std::string("-d1")}) {
            names.push_back(s + d);  // DenseSelect: one flat file
            names.push_back(s + d + ".header");
            names.push_back(s + d + ".bits");
            names.push_back(s + d + ".select");
            names.push_back(s + d + ".rank");
        }
    }
    names.push_back("-counts.ord0");
    names.push_back("-counts.ord1");
    names.push_back("-counts.ord2");

    uint64_t written = 0;
    for (auto& suffix : names) {
        std::string nm = base + suffix;
        if (!fac.fileExists(nm)) continue;
        const std::string& data = fac.readFile(nm);
        std::ofstream out(outdir + "/" + nm, std::ios::binary);
        out.write(data.data(), data.size());
        ++written;
    }
    std::cerr << "# wrote " << written << " files to " << outdir << "\n";
    return 0;
}
