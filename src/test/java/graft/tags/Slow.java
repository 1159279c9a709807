package graft.tags;

import java.lang.annotation.ElementType;
import java.lang.annotation.Inherited;
import java.lang.annotation.Retention;
import java.lang.annotation.RetentionPolicy;
import java.lang.annotation.Target;
import org.scalatest.TagAnnotation;

/**
 * Suite-level "slow tier" tag: suites carrying this annotation are
 * excluded from the fast iteration tier (sbt fastTest, which runs
 * ScalaTest with -l graft.tags.Slow) and run only in the full tier
 * that gates a round close. Tag suites dominated by full-surface
 * query sweeps, forked-JVM races, replica scale probes, or many
 * streaming checkpoint lifecycles.
 */
@TagAnnotation
@Inherited
@Retention(RetentionPolicy.RUNTIME)
@Target({ElementType.METHOD, ElementType.TYPE})
public @interface Slow {}
