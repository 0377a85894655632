// Micro-benchmark driving the REFERENCE parser+filter on a large synthetic
// log (measurement harness only; links the reference objects unmodified).
#include <chrono>
#include <cstdio>
#include <memory>
#include <string>
#include <cstring>
#include <vector>
#include "line_parsing/line_format.hpp"
#include "line_parsing/line_parser.hpp"
#include "line_parsing/parsing_data.hpp"
#include "file_parsing/filter_parsing.hpp"
#include "file_parsing/line_filter.hpp"
#include "file_parsing/processed_line.hpp"

int main(int argc, char** argv) {
    long reps = argc > 1 ? atol(argv[1]) : 100000;
    // the 62-line golden corpus, repeated
    const char* lines[] = {
#include "corpus_lines.inc"
    };
    const int NL = sizeof(lines)/sizeof(lines[0]);

    auto fmt = LineFormat::fromFormatString(
        "{INT:Date} {INT:Time} {STR:Level} :{CHR:,.,1}{STR:Source}: {STR:Mesg}");
    auto fmt2 = LineFormat::fromFormatString(
        "{INT:Date} {INT:Time} {STR:Level} :{CHR:,.,1}{STR:Source}: {STR:Mesg}");
    auto parser = Parser::fromLineFormat(std::move(fmt));
    auto filter = parse_filter_decl("Level EQ INFO", fmt2.get());

    long n = 0, wf = 0, pass = 0;
    auto t0 = std::chrono::steady_clock::now();
    std::vector<size_t> lens(NL);
    for (int i = 0; i < NL; i++) lens[i] = strlen(lines[i]);
    for (long r = 0; r < reps; r++) {
        for (int i = 0; i < NL; i++) {
            // exactly the per-line work FilteredFileReader does per scan
            // row (filtered_file_reader.cpp:236-270): construct
            // ProcessedLine (parses) then evaluate the filter
            ProcessedLine pl((line_t)n, lines[i], lens[i], parser.get(), 0);
            n++;
            if (pl.well_formated) {
                wf++;
                if (filter && filter->passes(&pl)) pass++;
            }
        }
    }
    auto dt = std::chrono::duration<double>(
        std::chrono::steady_clock::now() - t0).count();
    printf("lines=%ld wf=%ld pass=%ld sec=%.3f rate=%.0f lines/s\n",
           n, wf, pass, dt, n / dt);
    return 0;
}
