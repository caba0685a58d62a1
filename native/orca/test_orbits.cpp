// Sanitizer harness for the orbit counter: built with
// -fsanitize=address,undefined in CI (tests/test_native.py) and run over
// known graphs + a randomized sweep. Exits non-zero on any mismatch; the
// sanitizers catch memory/UB errors that Python-level tests cannot.

#include <cassert>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <vector>

extern "C" int orbit_counts_4(int n, int m, const int32_t* eu,
                              const int32_t* ev, int64_t* out);

static int check(bool ok, const char* what) {
  if (!ok) { std::fprintf(stderr, "FAIL: %s\n", what); return 1; }
  return 0;
}

int main() {
  int rc = 0;
  {
    // K4: every node in one K4 (orbit 14), three triangles (orbit 3)
    std::vector<int32_t> u = {0, 0, 0, 1, 1, 2}, v = {1, 2, 3, 2, 3, 3};
    std::vector<int64_t> out(4 * 15);
    rc |= check(orbit_counts_4(4, 6, u.data(), v.data(), out.data()) == 0, "K4 rc");
    for (int i = 0; i < 4; ++i) {
      rc |= check(out[i * 15 + 14] == 1, "K4 orbit14");
      rc |= check(out[i * 15 + 3] == 3, "K4 orbit3");
      rc |= check(out[i * 15 + 0] == 3, "K4 degree");
    }
  }
  {
    // C5: orbits 4/5 (P4 end/middle) == 2 each, no C4
    std::vector<int32_t> u = {0, 1, 2, 3, 4}, v = {1, 2, 3, 4, 0};
    std::vector<int64_t> out(5 * 15);
    rc |= check(orbit_counts_4(5, 5, u.data(), v.data(), out.data()) == 0, "C5 rc");
    for (int i = 0; i < 5; ++i) {
      rc |= check(out[i * 15 + 4] == 2, "C5 orbit4");
      rc |= check(out[i * 15 + 5] == 2, "C5 orbit5");
      rc |= check(out[i * 15 + 8] == 0, "C5 orbit8");
    }
  }
  {
    // error paths: bad vertex id, negative counts
    std::vector<int32_t> u = {0}, v = {9};
    std::vector<int64_t> out(2 * 15);
    rc |= check(orbit_counts_4(2, 1, u.data(), v.data(), out.data()) == -2,
                "bad vertex id");
    rc |= check(orbit_counts_4(-1, 0, u.data(), v.data(), out.data()) == -1,
                "negative n");
  }
  {
    // randomized sweep: total per-graphlet counts are consistent
    // (sum of orbit-3 over nodes == 3 * #triangles, etc.) on G(n, p)
    std::srand(12345);
    for (int trial = 0; trial < 20; ++trial) {
      int n = 8 + std::rand() % 24;
      std::vector<int32_t> u, v;
      for (int i = 0; i < n; ++i)
        for (int j = i + 1; j < n; ++j)
          if (std::rand() % 100 < 30) { u.push_back(i); v.push_back(j); }
      std::vector<int64_t> out((size_t)n * 15);
      rc |= check(orbit_counts_4(n, (int)u.size(), u.data(), v.data(),
                                 out.data()) == 0, "rand rc");
      long long tri = 0, k4 = 0;
      for (int i = 0; i < n; ++i) { tri += out[i * 15 + 3]; k4 += out[i * 15 + 14]; }
      rc |= check(tri % 3 == 0, "triangle count divisible by 3");
      rc |= check(k4 % 4 == 0, "K4 count divisible by 4");
    }
  }
  if (rc == 0) std::printf("orbit sanitizer tests passed\n");
  return rc;
}
