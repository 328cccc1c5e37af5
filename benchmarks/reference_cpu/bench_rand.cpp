// Reference rMult on a UNIFORM-RANDOM pattern (n=2M, ~5 nnz/row):
// the no-locality worst case, where x (8MB f32) misses cache per access.
namespace SMM { constexpr double residualSquared = 0; } // parse-scope shim for the reference CGS bug; CGS is never called
#include <sparse_matrix_math.h>
#include <chrono>
#include <cstdio>
#include <random>

template <typename T>
double bench(long n, int per_row, unsigned seed) {
    SMM::TripletMatrix<T> t;
    t.init(n, n, (long)per_row * n + n);
    std::mt19937_64 rng(seed);
    std::uniform_int_distribution<long> col(0, n - 1);
    for (long i = 0; i < n; ++i) {
        t.addEntry(i, i, T(6));
        for (int k = 0; k < per_row; ++k) t.addEntry(i, col(rng), T(-1));
    }
    SMM::CSRMatrix<T> a;
    a.init(t);
    SMM::Vector<T> x(n, T(1)), y0(n, T(0));
    const int reps = 10;
    a.rMult(x, y0);
    auto t0 = std::chrono::steady_clock::now();
    for (int r = 0; r < reps; ++r) a.rMult(x, y0);
    auto t1 = std::chrono::steady_clock::now();
    double sec = std::chrono::duration<double>(t1 - t0).count() / reps;
    return a.getNonZeroCount() / sec / 1e9;
}

int main() {
    // n=2M / 6 per row ~ 12M nnz — bench-scale; also n=200k (x fits L2)
    printf("{\"rand_2M_f32_gnnz\": %.4f, \"rand_200k_f32_gnnz\": %.4f}\n",
           bench<float>(2000000, 5, 42), bench<float>(200000, 5, 42));
    return 0;
}
