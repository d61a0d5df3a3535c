// Golden-image oracle harness.
//
// Compiles the *reference* scalar C++ path tracer (read-only at
// /root/reference) into a headless renderer that dumps raw float
// backbuffers, used to generate the committed golden fixtures in
// tests/golden/.  This file is OUR harness (modeled on the reference's C#
// CLI, Cs/Program.cs:7-59); the algorithm objects come from the reference
// sources via the include path, built single-threaded & scalar by defining
// __EMSCRIPTEN__ (Config.h:9-19 turns off SIMD and threads, so no enkiTS).
//
// Usage: oracle <width> <height> <frames> <flags> <out.raw>
//   Renders `frames` frames with progressive accumulation semantics driven
//   by the flags bits (kFlagAnimate=1, kFlagProgressive=2), writes the
//   final H*W*4 float32 backbuffer (row 0 = bottom) to out.raw, prints
//   "rays <total>" to stdout.  Time convention: time = frame / 60.0.

#include "Config.h"
#include "Test.h"
#include <cstdio>
#include <cstdlib>
#include <cstring>

int main(int argc, char** argv)
{
    if (argc != 6)
    {
        fprintf(stderr, "usage: %s w h frames flags out.raw\n", argv[0]);
        return 1;
    }
    int w = atoi(argv[1]);
    int h = atoi(argv[2]);
    int frames = atoi(argv[3]);
    unsigned flags = (unsigned)atoi(argv[4]);
    const char* outPath = argv[5];

    InitializeTest();
    float* backbuffer = new float[(size_t)w * h * 4];
    memset(backbuffer, 0, (size_t)w * h * 4 * sizeof(float));

    long long totalRays = 0;
    for (int f = 0; f < frames; ++f)
    {
        float time = (float)f / 60.0f;
        UpdateTest(time, f, w, h, flags);
        int rayCount = 0;
        DrawTest(time, f, w, h, backbuffer, rayCount, flags);
        totalRays += rayCount;
        printf("frame %d rays %d\n", f, rayCount);
    }
    printf("rays %lld\n", totalRays);

    FILE* fp = fopen(outPath, "wb");
    if (!fp)
    {
        fprintf(stderr, "cannot open %s\n", outPath);
        return 1;
    }
    fwrite(backbuffer, sizeof(float), (size_t)w * h * 4, fp);
    fclose(fp);
    ShutdownTest();
    delete[] backbuffer;
    return 0;
}
