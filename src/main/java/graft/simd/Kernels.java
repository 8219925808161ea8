package graft.simd;

/**
 * One-time kernel selection (the engine analogue of jvector's
 * {@code VectorizationProvider.getInstance()},
 * {@code VectorizationProvider.java:20-60}): Panama SIMD when
 * {@code jdk.incubator.vector} is readable by this JVM (requires
 * {@code --add-modules=jdk.incubator.vector}; build.sbt adds it for forked
 * test/run JVMs), scalar otherwise. The Panama class is loaded reflectively
 * so a JVM without the module never links against incubator types — it just
 * falls back, bit-identical to the pre-SIMD engine.
 *
 * Kill switch: {@code -Dgraft.simd=off} forces the scalar kernels.
 */
public final class Kernels {
  public static final VectorKernels INSTANCE = load();

  private Kernels() {}

  private static VectorKernels load() {
    if ("off".equalsIgnoreCase(System.getProperty("graft.simd", ""))) {
      return new ScalarKernels();
    }
    try {
      Class<?> c = Class.forName("graft.simd.PanamaKernels");
      return (VectorKernels) c.getDeclaredConstructor().newInstance();
    } catch (Throwable t) {
      // module absent (no --add-modules) or class init failed: scalar
      return new ScalarKernels();
    }
  }
}
