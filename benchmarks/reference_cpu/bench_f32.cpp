// f32/f64 baseline measurement of the reference rMult on the 2-D Poisson
// 5-point system (same config as BASELINE.md, which measured f64 only).
namespace SMM { constexpr double residualSquared = 0; } // parse-scope shim for the reference CGS bug (h:2171-2172); CGS is never called
#include <sparse_matrix_math.h>
#include <chrono>
#include <cstdio>
#include <vector>

template <typename T>
double bench(int nx) {
    const long n = (long)nx * nx;
    SMM::TripletMatrix<T> t;
    t.init(n, n, 5 * n);
    for (long i = 0; i < n; ++i) {
        long x = i % nx, y = i / nx;
        t.addEntry(i, i, T(4));
        if (x > 0) t.addEntry(i, i - 1, T(-1));
        if (x < nx - 1) t.addEntry(i, i + 1, T(-1));
        if (y > 0) t.addEntry(i, i - nx, T(-1));
        if (y < nx - 1) t.addEntry(i, i + nx, T(-1));
    }
    SMM::CSRMatrix<T> a;
    a.init(t);
    SMM::Vector<T> x(n, T(1)), y0(n, T(0));
    const int reps = 20;
    a.rMult(x, y0);
    auto t0 = std::chrono::steady_clock::now();
    for (int r = 0; r < reps; ++r) a.rMult(x, y0);
    auto t1 = std::chrono::steady_clock::now();
    double sec = std::chrono::duration<double>(t1 - t0).count() / reps;
    long nnz = 5L * n - 4L * nx;
    return nnz / sec / 1e9;
}

int main() {
    printf("{\"f32_gnnz\": %.4f, \"f64_gnnz\": %.4f}\n",
           bench<float>(1414), bench<double>(1414));
    return 0;
}
