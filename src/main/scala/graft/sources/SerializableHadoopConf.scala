package graft.sources

import java.io.{IOException, ObjectInputStream, ObjectOutputStream}

import org.apache.hadoop.conf.Configuration

/** A Hadoop [[Configuration]] that can ride a task closure. Configuration
  * is a Hadoop `Writable`, not `java.io.Serializable`, so readers built on
  * executors cannot receive the SESSION conf directly — and opening files
  * with a bare `new Configuration()` drops session-scoped settings (s3a
  * credentials, endpoints, custom filesystems). This wrapper serializes
  * the conf through its own Writable form (the standard Hadoop pattern;
  * Spark keeps an identical `SerializableConfiguration` internally, but it
  * is `private[spark]`).
  *
  * Deserialization rebuilds with `loadDefaults = false`: every default the
  * driver saw was captured by `write`, so the executor-side conf is an
  * exact snapshot, not a merge with executor-local defaults. */
private[graft] class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {

  @throws[IOException]
  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }

  @throws[IOException]
  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}
