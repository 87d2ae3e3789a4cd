// Parity-debugging probe: drives the UNMODIFIED reference engine
// (/root/reference, compiled in via an include with its main() renamed)
// through a greedy decode and dumps every step's full logits vector as
// raw f32 to a file, so tools/parity_check.py-style comparisons can
// localize the first numerically diverging step instead of diffing text.
//
// Build:
//   g++ -std=c++17 -O2 -fopenmp [-mavx -mf16c] tools/ref_probe.cpp \
//       -o /tmp/parity/ref_probe
// Run:
//   ref_probe <model.gten> <fp16|q8|q4> <npred> <logits.bin> t0 t1 ...
// Output: stdout lines "step argmax logit"; logits.bin = [n_steps, 32003]
// f32 (logits after feeding each prompt token from the last prompt token
// onward, then after each generated token).

#define main reference_main_disabled
#include "/root/reference/tinyllama.cpp"
#undef main

#include <cstdio>
#include <cstdlib>
#include <fstream>
#include <string>
#include <vector>

int main(int argc, char** argv) {
    if (argc < 6) {
        std::fprintf(stderr,
                     "usage: %s MODEL DTYPE NPRED LOGITS_BIN TOK...\n",
                     argv[0]);
        return 2;
    }
    const std::string model_path = argv[1];
    const std::string dtype_s = argv[2];
    const int npred = std::atoi(argv[3]);
    const std::string logits_path = argv[4];
    std::vector<int> tokens;
    for (int i = 5; i < argc; i++) tokens.push_back(std::atoi(argv[i]));

    ModuleDtype dtype;
    if (dtype_s == "fp16") {
        dtype.wdtype = kFloat16;
        dtype.adtype = kFloat16;
    } else if (dtype_s == "q8") {
        dtype.wdtype = kQint8;
        dtype.adtype = kQint8;
    } else {
        dtype.wdtype = kQint4;
        dtype.adtype = kQint8;
    }

    std::ifstream checkpoint{model_path, std::ios::binary};
    GTEN_ASSERT(checkpoint.is_open());
    TinyLlama model{npred, dtype};
    model.load_from_ckpt(checkpoint);

    std::ofstream lf{logits_path, std::ios::binary};
    const int n_vocab = 32003;

    // mirror greedy_sample's loop (tinyllama.cpp:395-440): feed the whole
    // prompt with start_pos=0 once, then one token at a time
    int step = 0;
    const int max_iters = npred - (int)tokens.size();
    for (int i = 0; i < max_iters; i++, step++) {
        Tensor input{(void*)tokens.data(), {(int)tokens.size()}, kInt32};
        const int start_pos = (i == 0) ? 0 : (int)tokens.size() - 1;
        Tensor logits = model.logits(input, start_pos);
        const float* ld = logits.data_ptr<float>();
        lf.write(reinterpret_cast<const char*>(ld),
                 n_vocab * sizeof(float));
        int best = 0;
        float best_v = ld[0];
        for (int j = 1; j < n_vocab; j++) {
            if (ld[j] > best_v) { best_v = ld[j]; best = j; }
        }
        std::printf("%d %d %.9g\n", step, best, best_v);
        if (best == 32002) break;  // eos
        tokens.push_back(best);
    }
    return 0;
}
