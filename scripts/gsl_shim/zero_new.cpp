/* calloc-backed global operator new: makes the reference's reads of
 * uninitialized fresh allocations deterministic (= 0) for golden generation
 * (DEVIATIONS.md items 1, 3).  calloc zeroes reused chunks too, so every
 * `new` allocation reads as zero regardless of heap history. */
#include <cstdlib>
#include <cstring>
#include <new>

void* operator new(std::size_t n) {
  void* p = calloc(n ? n : 1, 1);
  if (!p) throw std::bad_alloc();
  return p;
}
void* operator new[](std::size_t n) {
  void* p = calloc(n ? n : 1, 1);
  if (!p) throw std::bad_alloc();
  return p;
}
void operator delete(void* p) noexcept { free(p); }
void operator delete[](void* p) noexcept { free(p); }
void operator delete(void* p, std::size_t) noexcept { free(p); }
void operator delete[](void* p, std::size_t) noexcept { free(p); }
