// Double-mapped circular buffer + SPSC queue + file pump thread.
//
// TPU-native rebuild of the reference's buffer_cpu_vmcirc
// (runtime/include/gnuradio/buffer_cpu_vmcirc*.h): the same pages are
// mapped twice back-to-back so every read/write window is linear across
// the wrap — no copy-on-wrap. Where the reference hands these buffers to
// scheduler threads, here a single native pump thread streams a file (or
// any fd) into the ring at full page-cache speed while the Python side
// hands zero-copy windows to the JAX host-ingest staging path
// (blocks/fileio.file_source host_pull).
//
// Build: g++ -O2 -shared -fPIC -o libvmcirc.so vmcirc_ring.cpp -lpthread
// Binding: ctypes (newsched_tpu/io/native_ring.py).

#include <atomic>
#include <cstdint>
#include <cstring>
#include <cstdio>
#include <fcntl.h>
#include <pthread.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct Ring {
    uint8_t* base = nullptr;   // double-mapped region of 2*size bytes
    size_t size = 0;           // capacity in bytes (page multiple)
    std::atomic<uint64_t> head{0};  // written bytes (producer)
    std::atomic<uint64_t> tail{0};  // consumed bytes (consumer)
    // pump thread state
    pthread_t pump_thread{};
    int pump_fd = -1;
    int pump_loop = 0;
    std::atomic<int> pump_running{0};
    std::atomic<int> pump_eof{0};
};

void* pump_main(void* arg) {
    Ring* r = static_cast<Ring*>(arg);
    while (r->pump_running.load(std::memory_order_acquire)) {
        uint64_t head = r->head.load(std::memory_order_relaxed);
        uint64_t tail = r->tail.load(std::memory_order_acquire);
        size_t space = r->size - static_cast<size_t>(head - tail);
        if (space == 0) {
            struct timespec ts {0, 200000};  // 200 us
            nanosleep(&ts, nullptr);
            continue;
        }
        uint8_t* dst = r->base + (head % r->size);
        ssize_t n = read(r->pump_fd, dst, space);
        if (n > 0) {
            r->head.store(head + static_cast<uint64_t>(n), std::memory_order_release);
        } else if (n == 0) {
            if (r->pump_loop) {
                lseek(r->pump_fd, 0, SEEK_SET);
            } else {
                r->pump_eof.store(1, std::memory_order_release);
                break;
            }
        } else {
            r->pump_eof.store(1, std::memory_order_release);
            break;
        }
    }
    return nullptr;
}

}  // namespace

extern "C" {

// Create a double-mapped ring of at least `min_size` bytes. Returns an
// opaque handle or nullptr.
void* ring_create(size_t min_size) {
    long page = sysconf(_SC_PAGESIZE);
    size_t size = ((min_size + page - 1) / page) * page;
    int fd = memfd_create("newsched_vmcirc", 0);
    if (fd < 0) return nullptr;
    if (ftruncate(fd, static_cast<off_t>(size)) != 0) {
        close(fd);
        return nullptr;
    }
    // Reserve 2*size of address space, then map the same pages twice.
    uint8_t* base = static_cast<uint8_t*>(
        mmap(nullptr, 2 * size, PROT_NONE, MAP_PRIVATE | MAP_ANONYMOUS, -1, 0));
    if (base == MAP_FAILED) {
        close(fd);
        return nullptr;
    }
    if (mmap(base, size, PROT_READ | PROT_WRITE, MAP_SHARED | MAP_FIXED, fd, 0) ==
            MAP_FAILED ||
        mmap(base + size, size, PROT_READ | PROT_WRITE, MAP_SHARED | MAP_FIXED, fd,
             0) == MAP_FAILED) {
        munmap(base, 2 * size);
        close(fd);
        return nullptr;
    }
    close(fd);  // mappings keep the pages alive
    Ring* r = new Ring();
    r->base = base;
    r->size = size;
    return r;
}

void ring_destroy(void* h) {
    Ring* r = static_cast<Ring*>(h);
    if (!r) return;
    if (r->pump_running.load()) {
        r->pump_running.store(0);
        pthread_join(r->pump_thread, nullptr);
    }
    if (r->pump_fd >= 0) close(r->pump_fd);
    munmap(r->base, 2 * r->size);
    delete r;
}

size_t ring_capacity(void* h) { return static_cast<Ring*>(h)->size; }

// Bytes available to read.
size_t ring_read_avail(void* h) {
    Ring* r = static_cast<Ring*>(h);
    return static_cast<size_t>(r->head.load(std::memory_order_acquire) -
                               r->tail.load(std::memory_order_relaxed));
}

size_t ring_write_avail(void* h) {
    Ring* r = static_cast<Ring*>(h);
    return r->size - static_cast<size_t>(r->head.load(std::memory_order_relaxed) -
                                         r->tail.load(std::memory_order_acquire));
}

// Pointer to the current linear read window (valid for ring_read_avail
// bytes thanks to the double mapping).
uint8_t* ring_read_ptr(void* h) {
    Ring* r = static_cast<Ring*>(h);
    return r->base + (r->tail.load(std::memory_order_relaxed) % r->size);
}

void ring_read_commit(void* h, size_t n) {
    Ring* r = static_cast<Ring*>(h);
    r->tail.fetch_add(n, std::memory_order_release);
}

uint8_t* ring_write_ptr(void* h) {
    Ring* r = static_cast<Ring*>(h);
    return r->base + (r->head.load(std::memory_order_relaxed) % r->size);
}

void ring_write_commit(void* h, size_t n) {
    Ring* r = static_cast<Ring*>(h);
    r->head.fetch_add(n, std::memory_order_release);
}

// Copy-out read (for callers that want their own buffer). Returns bytes read.
size_t ring_read(void* h, uint8_t* dst, size_t n) {
    Ring* r = static_cast<Ring*>(h);
    size_t avail = ring_read_avail(h);
    size_t take = n < avail ? n : avail;
    memcpy(dst, ring_read_ptr(h), take);
    r->tail.fetch_add(take, std::memory_order_release);
    return take;
}

size_t ring_write(void* h, const uint8_t* src, size_t n) {
    Ring* r = static_cast<Ring*>(h);
    size_t space = ring_write_avail(h);
    size_t put = n < space ? n : space;
    memcpy(ring_write_ptr(h), src, put);
    r->head.fetch_add(put, std::memory_order_release);
    return put;
}

// Start a background thread streaming `path` into the ring.
int ring_start_file_pump(void* h, const char* path, int loop) {
    Ring* r = static_cast<Ring*>(h);
    r->pump_fd = open(path, O_RDONLY);
    if (r->pump_fd < 0) return -1;
    r->pump_loop = loop;
    r->pump_eof.store(0);
    r->pump_running.store(1);
    if (pthread_create(&r->pump_thread, nullptr, pump_main, r) != 0) {
        r->pump_running.store(0);
        close(r->pump_fd);
        r->pump_fd = -1;
        return -2;
    }
    return 0;
}

int ring_pump_eof(void* h) { return static_cast<Ring*>(h)->pump_eof.load(); }

void ring_stop_pump(void* h) {
    Ring* r = static_cast<Ring*>(h);
    if (r->pump_running.load()) {
        r->pump_running.store(0);
        pthread_join(r->pump_thread, nullptr);
    }
}

}  // extern "C"
