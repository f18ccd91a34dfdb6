package graft.onnx
/** Dev-only: serialize the realistic conv-head fixture for ModelCheck. */
object DumpHead {
  def main(args: Array[String]): Unit = {
    val f = new java.io.FileOutputStream("/tmp/realistic_head.onnx")
    try f.write(TestOnnx.realisticConvHead(11)) finally f.close()
    println("wrote /tmp/realistic_head.onnx")
  }
}
