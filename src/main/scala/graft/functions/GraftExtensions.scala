package graft.functions

import org.apache.spark.sql.SparkSessionExtensions

/** Registers graft's native Catalyst expressions. Usable two ways:
  *   - `SparkSession.builder.withExtensions(new GraftExtensions)`
  *     (graft.Sessions does this), or
  *   - `--conf spark.sql.extensions=graft.functions.GraftExtensions`
  *     on a real cluster — no code changes needed at the call site.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(QuantizedDot.descriptor)
    e.injectFunction(QuantizedL2.descriptor)
    e.injectFunction(Rgb565.descriptor)
    e.injectFunction(TopKByScore.descriptor)
    e.injectFunction(RollingMinMd5.descriptor)
    e.injectFunction(SimHash64.descriptor)
    e.injectFunction(WordShingles.descriptor)
    e.injectFunction(FreqSketch.descriptor)
    e.injectFunction(NGramsGen.descriptor)
    e.injectFunction(SortedIntersectCount.descriptor)
    e.injectFunction(SpanHashes.descriptor)
    e.injectFunction(BpeMerge.descriptor)
    // Real pure-JVM BMP codec kernels (multimodal pipeline, q31b/q31e).
    e.injectFunction(graft.multimodal.BmpCodec.encodeDescriptor)
    e.injectFunction(graft.multimodal.BmpCodec.decodeDescriptor)
    e.injectFunction(graft.multimodal.BmpCodec.resizeDescriptor)
    // Real pure-JVM PCM WAV codec kernels (multimodal pipeline, q31c).
    e.injectFunction(graft.multimodal.WavCodec.encodeDescriptor)
    e.injectFunction(graft.multimodal.WavCodec.decodeDescriptor)
    // Real pure-JVM DIB-in-AVI video container: header-only meta scalar
    // + frame-sampling generator (multimodal pipeline, q31d).
    e.injectFunction(graft.multimodal.AviCodec.encodeDescriptor)
    e.injectFunction(graft.multimodal.AviCodec.metaDescriptor)
    e.injectFunction(graft.multimodal.AviCodec.framesDescriptor)
    // Whole-operator exemplar (§7.3(c)): native backward as-of join.
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    // Optimizer-rule exemplar (§7.3(b)): custom nodes are pushdown
    // barriers by default; restore left-side predicate pushdown.
    e.injectOptimizerRule(_ => graft.plans.PushFilterThroughAsOfJoin)
  }
}
