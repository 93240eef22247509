package graft.tools
object BloomProbe {
  def main(args: Array[String]): Unit = {
    val conf = new org.apache.hadoop.conf.Configuration()
    args.foreach { p =>
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(p), conf))
      try {
        val cols = reader.getFooter.getBlocks.get(0).getColumns
        (0 until cols.size).map(cols.get).foreach { c =>
          println(s"$p ${c.getPath.toDotString} bloomOff=${c.getBloomFilterOffset} bloomLen=${c.getBloomFilterLength}")
          val bf = reader.readBloomFilter(c)
          println(s"  readBloomFilter -> ${if (bf == null) "null" else bf.getClass.getSimpleName}")
        }
      } finally reader.close()
    }
  }
}
