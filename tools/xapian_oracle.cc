// Rank-identity oracle driver: index documents and answer queries through
// the REAL xapian-core (the library the reference links), exercising the
// exact call sequence mdq uses:
//
//   index: TermGenerator + Stem("en"), index_text(body) (positions +
//          Z-stems), set_data(url), add_boolean_term("Q"+url),
//          replace_document("Q"+url, doc), commit once at the end
//          (src/document.rs:162-190, src/main.rs:78-110)
//   query: each whitespace/quoted token parsed INDIVIDUALLY by QueryParser
//          with mdq's flag set, OR-folded (the operator-free path,
//          src/interactive/xapian_utils.rs:455-479), Enquire::get_mset(0,k)
//
// usage:
//   xapian_oracle <dbpath> index  < docs.tsv    # url \t text (escaped \t\n\\)
//   xapian_oracle <dbpath> query <k> < queries.txt
//
// query output, one line per hit: <query#> \t <rank> \t <docid> \t <weight>
// (weight printed with 17 significant digits)

#include <xapian.h>

#include <cstdio>
#include <cstring>
#include <iostream>
#include <sstream>
#include <string>
#include <vector>

static std::string unescape(const std::string& s) {
    std::string out;
    out.reserve(s.size());
    for (size_t i = 0; i < s.size(); ++i) {
        if (s[i] == '\\' && i + 1 < s.size()) {
            char c = s[++i];
            if (c == 't') out += '\t';
            else if (c == 'n') out += '\n';
            else out += c;
        } else {
            out += s[i];
        }
    }
    return out;
}

// mdq's token grammar (xapian_utils.rs:434-436): tokens are quoted strings
// (kept with quotes so QueryParser sees a phrase) or [A-Za-z0-9_]+ runs —
// every other character is a separator (so "at&t" is the tokens "at","t",
// exactly as the nom `word` parser yields them).
static bool word_char(char c) {
    return isalnum((unsigned char)c) || c == '_';
}

// mdq's expression = many1(alt((quoted, tagged, word, whitespace)))
// (xapian_utils.rs:434-436): alternatives in order at the current position,
// and parsing STOPS at the first character none matches — the rest of the
// chunk is dropped ("at&t" yields only "at").
static std::vector<std::string> split_tokens(const std::string& q) {
    std::vector<std::string> toks;
    size_t i = 0;
    while (i < q.size()) {
        if (q[i] == '"' || q[i] == '\'') {
            char quote = q[i];
            size_t j = q.find(quote, i + 1);
            if (j == std::string::npos) break;  // unclosed quote: no match
            toks.push_back(q.substr(i, j - i + 1));
            i = j + 1;
        } else if (word_char(q[i])) {
            size_t j = i;
            while (j < q.size() && word_char(q[j])) ++j;
            // tagged token: word:(quoted|word) is ONE token
            // (xapian_utils.rs:310-312)
            if (j < q.size() && q[j] == ':' && j + 1 < q.size()) {
                if (q[j + 1] == '"') {
                    size_t e = q.find('"', j + 2);
                    if (e != std::string::npos) {
                        toks.push_back(q.substr(i, e - i + 1));
                        i = e + 1;
                        continue;
                    }
                } else if (word_char(q[j + 1])) {
                    size_t e = j + 1;
                    while (e < q.size() && word_char(q[e])) ++e;
                    toks.push_back(q.substr(i, e - i));
                    i = e;
                    continue;
                }
            }
            toks.push_back(q.substr(i, j - i));
            i = j;
        } else if (isspace((unsigned char)q[i])) {
            ++i;
        } else {
            break;  // nom many1 stops; remainder discarded
        }
    }
    return toks;
}

// mdq's field-tag -> prefix mapping (xapian_utils.rs:360-394); returns empty
// string for unknown fields (which fall through whole to the QueryParser).
static std::string field_prefix(const std::string& field) {
    if (field == "fullpath") return "U";
    if (field == "subtitle") return "XS";
    if (field == "author") return "A";
    if (field == "title") return "S";
    if (field == "date") return "D";
    if (field == "tag") return "K";
    return "";
}

int main(int argc, char** argv) {
    if (argc < 3) {
        std::cerr << "usage: xapian_oracle <db> index|query [k]\n";
        return 2;
    }
    std::string dbpath = argv[1];
    std::string mode = argv[2];

    if (mode == "index") {
        Xapian::WritableDatabase db(dbpath, Xapian::DB_CREATE_OR_OPEN);
        Xapian::TermGenerator tg;
        Xapian::Stem stem("en");
        tg.set_stemmer(stem);
        std::string line;
        while (std::getline(std::cin, line)) {
            size_t tab = line.find('\t');
            if (tab == std::string::npos) continue;
            std::string url = unescape(line.substr(0, tab));
            std::string text = unescape(line.substr(tab + 1));
            Xapian::Document doc;
            tg.set_document(doc);
            tg.index_text(text);
            doc.set_data(url);
            doc.add_boolean_term("Q" + url);
            db.replace_document("Q" + url, doc);
        }
        db.commit();
        std::cout << "indexed " << db.get_doccount() << "\n";
        return 0;
    }

    if (mode == "index-md") {
        // full mdq update_index field sequence (src/document.rs:162-190):
        // TSV columns url, title, subtitle, authors (already comma-joined),
        // tags ('|'-separated), date (pre-rendered RFC3339), body
        Xapian::WritableDatabase db(dbpath, Xapian::DB_CREATE_OR_OPEN);
        Xapian::TermGenerator tg;
        Xapian::Stem stem("en");
        tg.set_stemmer(stem);
        std::string line;
        while (std::getline(std::cin, line)) {
            std::vector<std::string> f;
            size_t start = 0;
            while (f.size() < 6) {
                size_t tab = line.find('\t', start);
                f.push_back(unescape(line.substr(start, tab - start)));
                start = tab + 1;
            }
            f.push_back(unescape(line.substr(start)));
            const std::string& url = f[0];
            Xapian::Document doc;
            tg.set_document(doc);
            tg.index_text(f[3], 1, "A");   // authors (comma-joined)
            tg.index_text(f[5], 1, "D");   // date string
            tg.index_text(url, 1, "U");
            tg.index_text(f[1], 1, "S");   // title
            tg.index_text(f[2], 1, "XS");  // subtitle
            {   // tags one by one
                std::stringstream ss(f[4]);
                std::string tag;
                while (std::getline(ss, tag, '|'))
                    if (!tag.empty()) tg.index_text(tag, 1, "K");
            }
            tg.index_text(f[6]);           // body, unprefixed
            doc.set_data(url);
            doc.add_boolean_term("Q" + url);
            db.replace_document("Q" + url, doc);
        }
        db.commit();
        std::cout << "indexed " << db.get_doccount() << "\n";
        return 0;
    }

    if (mode == "query-raw") {
        // each line -> ONE qp.parse_query call (the path mdq uses for
        // chunks BEFORE an operator keyword, xapian_utils.rs:597-600);
        // prints the query description then the mset rows
        int k = argc > 3 ? atoi(argv[3]) : 100;
        Xapian::Database db(dbpath);
        Xapian::Stem stem("en");
        Xapian::QueryParser qp;
        qp.set_stemmer(stem);
        qp.set_database(db);
        unsigned flags = Xapian::QueryParser::FLAG_BOOLEAN |
                         Xapian::QueryParser::FLAG_PHRASE |
                         Xapian::QueryParser::FLAG_LOVEHATE |
                         Xapian::QueryParser::FLAG_BOOLEAN_ANY_CASE |
                         Xapian::QueryParser::FLAG_WILDCARD |
                         Xapian::QueryParser::FLAG_PURE_NOT |
                         Xapian::QueryParser::FLAG_PARTIAL |
                         Xapian::QueryParser::FLAG_SPELLING_CORRECTION;
        std::string line;
        int qn = 0;
        while (std::getline(std::cin, line)) {
            try {
                Xapian::Query query = qp.parse_query(unescape(line), flags);
                std::printf("%d\tDESC\t%s\n", qn,
                            query.get_description().c_str());
                Xapian::Enquire enq(db);
                enq.set_query(query);
                Xapian::MSet mset = enq.get_mset(0, k);
                int rank = 1;
                for (auto it = mset.begin(); it != mset.end(); ++it, ++rank)
                    std::printf("%d\t%d\t%u\t%.17g\n", qn, rank, *it,
                                it.get_weight());
            } catch (const Xapian::Error& e) {
                std::printf("%d\tERROR\t%s\n", qn, e.get_type());
            }
            ++qn;
        }
        return 0;
    }

    if (mode == "query-mdq") {
        // bug-for-bug mdq parse_user_query (xapian_utils.rs:578-654):
        // priority-ordered case-sensitive take_until splitting (no word
        // boundaries), raw parse_query for every chunk before an operator,
        // the per-token expression path for the final remainder
        int k = argc > 3 ? atoi(argv[3]) : 100;
        Xapian::Database db(dbpath);
        Xapian::Stem stem("en");
        Xapian::QueryParser qp;
        qp.set_stemmer(stem);
        // NO set_database — mdq's parse_user_query never calls it
        // (xapian_utils.rs:579-586); see the "query" mode note
        unsigned flags = Xapian::QueryParser::FLAG_BOOLEAN |
                         Xapian::QueryParser::FLAG_PHRASE |
                         Xapian::QueryParser::FLAG_LOVEHATE |
                         Xapian::QueryParser::FLAG_BOOLEAN_ANY_CASE |
                         Xapian::QueryParser::FLAG_WILDCARD |
                         Xapian::QueryParser::FLAG_PURE_NOT |
                         Xapian::QueryParser::FLAG_PARTIAL |
                         Xapian::QueryParser::FLAG_SPELLING_CORRECTION;
        struct OpDef { const char* kw; Xapian::Query::op op; };
        static const OpDef PRIO[] = {
            {"AND MAYBE", Xapian::Query::OP_AND_MAYBE},
            {"AND NOT", Xapian::Query::OP_AND_NOT},
            {"SYNONYM", Xapian::Query::OP_SYNONYM},
            {"FILTER", Xapian::Query::OP_FILTER},
            {"ELITE", Xapian::Query::OP_ELITE_SET},
            {"NEAR", Xapian::Query::OP_NEAR},
            {"AND", Xapian::Query::OP_AND},
            {"XOR", Xapian::Query::OP_XOR},
            {"OR", Xapian::Query::OP_OR},
        };
        auto expression_query = [&](const std::string& chunk) {
            Xapian::Query q = Xapian::Query::MatchNothing;
            bool first = true;
            for (const auto& tok : split_tokens(chunk)) {
                Xapian::Query part;
                size_t colon = tok.find(':');
                if (colon != std::string::npos && tok[0] != '"') {
                    std::string field = tok.substr(0, colon);
                    for (auto& c : field) c = tolower((unsigned char)c);
                    std::string prefix = field_prefix(field);
                    if (!prefix.empty())
                        part = qp.parse_query(tok.substr(colon + 1), flags,
                                              prefix);
                    else
                        part = qp.parse_query(tok, flags);
                } else {
                    part = qp.parse_query(tok, flags);
                }
                if (first) { q = part; first = false; }
                else q = Xapian::Query(Xapian::Query::OP_OR, q, part);
            }
            return q;
        };
        auto find_op = [&](const std::string& s, size_t& pos,
                           size_t& len, Xapian::Query::op& op) {
            for (const auto& d : PRIO) {
                size_t i = s.find(d.kw);
                if (i != std::string::npos) {
                    pos = i; len = strlen(d.kw); op = d.op;
                    return true;
                }
            }
            return false;
        };
        std::string line;
        int qn = 0;
        while (std::getline(std::cin, line)) {
            try {
                std::string rest = unescape(line);
                size_t pos, len;
                Xapian::Query::op op;
                Xapian::Query query;
                if (!find_op(rest, pos, len, op)) {
                    query = expression_query(rest);
                } else {
                    query = qp.parse_query(rest.substr(0, pos), flags);
                    Xapian::Query::op pending = op;
                    rest = rest.substr(pos + len);
                    while (!rest.empty()) {
                        if (!find_op(rest, pos, len, op)) {
                            query = Xapian::Query(pending, query,
                                                  expression_query(rest));
                            rest.clear();
                            break;
                        }
                        query = Xapian::Query(
                            pending, query,
                            qp.parse_query(rest.substr(0, pos), flags));
                        pending = op;
                        rest = rest.substr(pos + len);
                    }
                }
                std::printf("%d\tDESC\t%s\n", qn,
                            query.get_description().c_str());
                Xapian::Enquire enq(db);
                enq.set_query(query);
                Xapian::MSet mset = enq.get_mset(0, k);
                int rank = 1;
                for (auto it = mset.begin(); it != mset.end(); ++it, ++rank)
                    std::printf("%d\t%d\t%u\t%.17g\n", qn, rank, *it,
                                it.get_weight());
            } catch (const Xapian::Error& e) {
                std::printf("%d\tERROR\t%s\n", qn, e.get_type());
            }
            ++qn;
        }
        return 0;
    }

    if (mode == "query") {
        int k = argc > 3 ? atoi(argv[3]) : 100;
        Xapian::Database db(dbpath);
        Xapian::Stem stem("en");
        Xapian::QueryParser qp;
        qp.set_stemmer(stem);
        // NO set_database: mdq's parse_user_query builds its QueryParser
        // with only a stemmer (xapian_utils.rs:579-586), so the
        // db-dependent c++/c# suffix rule always keeps the suffix
        // (queryparser_internal.cc:795-805 both lookups miss)
        // mdq's flag set (xapian_utils.rs:583-591)
        unsigned flags = Xapian::QueryParser::FLAG_BOOLEAN |
                         Xapian::QueryParser::FLAG_PHRASE |
                         Xapian::QueryParser::FLAG_LOVEHATE |
                         Xapian::QueryParser::FLAG_BOOLEAN_ANY_CASE |
                         Xapian::QueryParser::FLAG_WILDCARD |
                         Xapian::QueryParser::FLAG_PURE_NOT |
                         Xapian::QueryParser::FLAG_PARTIAL |
                         Xapian::QueryParser::FLAG_SPELLING_CORRECTION;

        // one chunk = mdq's operator-free path: per-token parse, OR-join;
        // tagged tokens parse their value with the field's prefix
        // (parse_query_with_prefix, xapian_utils.rs:442-453)
        auto parse_chunk = [&](const std::string& chunk) {
            Xapian::Query q = Xapian::Query::MatchNothing;
            bool first = true;
            for (const auto& tok : split_tokens(chunk)) {
                Xapian::Query part;
                size_t colon = tok.find(':');
                if (colon != std::string::npos && tok[0] != '"') {
                    std::string field = tok.substr(0, colon);
                    for (auto& c : field) c = tolower((unsigned char)c);
                    std::string prefix = field_prefix(field);
                    if (!prefix.empty()) {
                        part = qp.parse_query(tok.substr(colon + 1), flags,
                                              prefix);
                    } else {
                        part = qp.parse_query(tok, flags);
                    }
                } else {
                    part = qp.parse_query(tok, flags);
                }
                if (first) { q = part; first = false; }
                else q = Xapian::Query(Xapian::Query::OP_OR, q, part);
            }
            return q;
        };

        // mdq's operator splitter (xapian_utils.rs:578-654): scan for the
        // FIRST standalone operator keyword (alternation order breaks ties
        // at the same position), left-fold with Query(op, acc, chunk)
        struct OpDef { const char* kw; Xapian::Query::op op; };
        static const OpDef OPS[] = {
            {"AND MAYBE", Xapian::Query::OP_AND_MAYBE},
            {"AND NOT", Xapian::Query::OP_AND_NOT},
            {"SYNONYM", Xapian::Query::OP_SYNONYM},
            {"FILTER", Xapian::Query::OP_FILTER},
            {"ELITE", Xapian::Query::OP_ELITE_SET},
            {"NEAR", Xapian::Query::OP_NEAR},
            {"AND", Xapian::Query::OP_AND},
            {"XOR", Xapian::Query::OP_XOR},
            {"OR", Xapian::Query::OP_OR},
        };
        auto find_op = [&](const std::string& s, size_t& pos, size_t& len,
                           Xapian::Query::op& op) {
            for (size_t i = 0; i < s.size(); ++i) {
                if (i > 0 && word_char(s[i - 1])) continue;
                for (const auto& d : OPS) {
                    size_t n = strlen(d.kw);
                    if (s.compare(i, n, d.kw) == 0 &&
                        (i + n == s.size() || !word_char(s[i + n]))) {
                        pos = i; len = n; op = d.op;
                        return true;
                    }
                }
            }
            return false;
        };

        std::string line;
        int qn = 0;
        while (std::getline(std::cin, line)) {
            std::string rest = line;
            Xapian::Query query = Xapian::Query::MatchNothing;
            bool have = false;
            Xapian::Query::op pending = Xapian::Query::OP_OR;
            while (true) {
                size_t pos, len;
                Xapian::Query::op op;
                bool found = find_op(rest, pos, len, op);
                std::string chunk = found ? rest.substr(0, pos) : rest;
                Xapian::Query sub = parse_chunk(chunk);
                if (!have) { query = sub; have = true; }
                else query = Xapian::Query(pending, query, sub);
                if (!found) break;
                pending = op;
                rest = rest.substr(pos + len);
            }
            try {
                Xapian::Enquire enq(db);
                enq.set_query(query);
                Xapian::MSet mset = enq.get_mset(0, k);
                int rank = 1;
                for (auto it = mset.begin(); it != mset.end(); ++it, ++rank) {
                    std::printf("%d\t%d\t%u\t%.17g\n", qn, rank, *it,
                                it.get_weight());
                }
            } catch (const Xapian::Error& e) {
                std::printf("%d\tERROR\t%s\n", qn, e.get_type());
            }
            ++qn;
        }
        return 0;
    }
    if (mode == "unitable") {
        // Exhaustive dump of the Unicode tables the reference's tokenizer is
        // built on (xapian-core-1.4.17/include/xapian/unicode.h:343-381),
        // used to GENERATE our tokenizer's tables so classification can't
        // drift with Python's Unicode version. One line per codepoint where
        // anything is notable: cp \t wordchar \t digit \t stemgate \t lower
        // (stemgate = first-char category passes termgenerator_internal.cc's
        // SHOULD_STEM_MASK: Ll/Lt/Lm/Lo).
        for (unsigned cp = 0; cp <= 0x10FFFF; ++cp) {
            if (cp >= 0xD800 && cp <= 0xDFFF) continue;  // surrogates
            bool w = Xapian::Unicode::is_wordchar(cp);
            unsigned lo = Xapian::Unicode::tolower(cp);
            Xapian::Unicode::category cat = Xapian::Unicode::get_category(cp);
            bool d = (cat == Xapian::Unicode::DECIMAL_DIGIT_NUMBER);
            bool s = (cat == Xapian::Unicode::LOWERCASE_LETTER ||
                      cat == Xapian::Unicode::TITLECASE_LETTER ||
                      cat == Xapian::Unicode::MODIFIER_LETTER ||
                      cat == Xapian::Unicode::OTHER_LETTER);
            if (!w && lo == cp && !s) continue;
            std::printf("%u\t%d\t%d\t%d\t%u\n", cp, w ? 1 : 0, d ? 1 : 0,
                        s ? 1 : 0, lo);
        }
        return 0;
    }

    if (mode == "termdump") {
        // Per input line (escaped \t\n\\): run the exact index-path term
        // pipeline (TermGenerator + Stem("en") + positions, as mdq's
        // update_index does for the body) on the line alone, then dump the
        // resulting termlist: <line#> \t <term> \t <wdf> \t <pos,pos,...>
        // (positions comma-joined, empty for Z-stems). The conformance
        // oracle for tests/test_tokenizer_parity.py's multilingual fuzz.
        Xapian::TermGenerator tg;
        Xapian::Stem stem("en");
        tg.set_stemmer(stem);
        std::string line;
        int qn = 0;
        while (std::getline(std::cin, line)) {
            std::string text = unescape(line);
            Xapian::Document doc;
            tg.set_document(doc);
            tg.index_text(text);
            for (auto t = doc.termlist_begin(); t != doc.termlist_end();
                 ++t) {
                std::string term = *t;
                std::string esc;
                for (char c : term) {
                    if (c == '\\') esc += "\\\\";
                    else if (c == '\t') esc += "\\t";
                    else if (c == '\n') esc += "\\n";
                    else esc += c;
                }
                std::printf("%d\t%s\t%u\t", qn, esc.c_str(),
                            (unsigned)t.get_wdf());
                bool first = true;
                for (auto p = t.positionlist_begin();
                     p != t.positionlist_end(); ++p) {
                    std::printf(first ? "%u" : ",%u", (unsigned)*p);
                    first = false;
                }
                std::printf("\n");
            }
            ++qn;
        }
        return 0;
    }

    std::cerr << "unknown mode " << mode << "\n";
    return 2;
}
